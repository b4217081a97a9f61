package graft

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct expression must be bit-identical to the HOF fold
  * (same sequential accumulation order) on real embeddings. */
class VectorExprSpec extends AnyFunSuite with SparkSpec {

  test("graft_dot == aggregate(zip_with(...)) bit-for-bit on all embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = emb.select(
      col("vec_id"),
      Similarity.dot(col("v"), col("v")).as("native"),
      Similarity.dotHof(col("v"), col("v")).as("hof"))
    val mismatches = both.where(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
    assert(both.count() === 500)
  }

  test("graft_dot is callable from spark.sql") {
    graft.functions.VectorExpressions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(2.0d, 0.5d, 1.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 6.0)
  }

  test("graft_md5_sim64 == the conv/substr hex-digit formulation on real shingles") {
    import org.apache.spark.sql.functions.{expr, col}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sh = graft.ext.Dedup.docShingles(docs).limit(5000)
      .select(col("shingle"), md5(col("shingle")).as("m"))
    // reference: digit i of md5 at bits [4i, 4i+3] (the pre-kernel SQL form)
    val reference = (0 until 16)
      .map(i => expr(s"cast(conv(substr(m, ${i + 1}, 1), 16, 10) as bigint) << ${4 * i}"))
      .reduce(_ + _)
    val both = sh.select(
      graft.functions.Md5Sim.apply(spark, col("shingle")).as("kernel"),
      reference.as("ref"))
    assert(both.where(col("kernel") =!= col("ref")).count() === 0)
    assert(both.count() > 0)
  }

  test("graft_md5_sim64: interpreted eval equals codegen (and a known value)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val s = "the quick brown fox"
    val interpreted = graft.functions.Md5Sim64(Literal(UTF8String.fromString(s)))
      .eval(null).asInstanceOf[Long]
    assert(interpreted === graft.functions.Md5Sim.sim64(s.getBytes("UTF-8")))
    // hex digits of md5("the quick brown fox") = "a2004f37730b9445..."
    // digit 0 = 0xa at bits 0..3, digit 1 = 0x2 at bits 4..7, ...
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val expected = hex.zipWithIndex.map { case (c, i) =>
      java.lang.Long.parseLong(c.toString, 16) << (4 * i)
    }.sum
    assert(interpreted === expected)
  }
}
