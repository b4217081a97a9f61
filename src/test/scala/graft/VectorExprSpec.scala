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
}
