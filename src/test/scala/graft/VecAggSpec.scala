package graft

import graft.ext.IvfKMeans
import graft.functions.VecAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecAggSpec extends AnyFunSuite with SparkSpec {

  test("vecSum aggregate == driver elementwise sum, per group and global") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0, 2.0, 3.0)), (0, Seq(0.5, -1.0, 4.0)),
      (1, Seq(10.0, 0.0, -2.0)),
      (1, Seq(1.0, 1.0, 1.0)), (1, Seq(2.0, 2.0, 2.0)))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(VecAgg.vecSum(spark, col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got(0) === Seq(1.5, 1.0, 7.0))
    assert(got(1) === Seq(13.0, 3.0, 1.0))
    // real data: global sum over sf0.001 embeddings == driver recount
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
    val agg = emb.agg(VecAgg.vecSum(spark, col("v"))).collect()(0)
      .getSeq[Double](0)
    val brute = emb.collect().map(_.getSeq[Double](0).toArray)
      .reduce { (a, b) => a.indices.foreach(i => a(i) += b(i)); a }
    agg.indices.foreach(i => assert(math.abs(agg(i) - brute(i)) < 1e-6))
  }

  test("integer-micro pooling (q_vec_pool shape) equals the posexplode " +
      "replay exactly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val micros = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000), 0).cast("double"))
    val pooled = emb.groupBy("label")
      .agg(VecAgg.vecSum(spark, micros).as("sv"))
      .select(col("label"), transform(col("sv"), _.cast("long")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    // shuffle-heavy reference formulation the aggregate replaces
    val replay = emb
      .select(col("label"), posexplode(micros).as(Seq("i", "x")))
      .groupBy("label", "i").agg(sum(col("x").cast("long")).as("s"))
      .collect().groupBy(_.getInt(0)).view.mapValues(rows =>
        rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap
    assert(pooled === replay)
    // one shuffle total: partial vec-sum buffers map-side, k rows cross
    val plan = emb.groupBy("label")
      .agg(VecAgg.vecSum(spark, micros).as("sv"))
      .queryExecution.executedPlan.toString()
    val exchanges = plan.split("\n").count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("vecSum fails loudly on mixed vector lengths instead of silently " +
      "mis-summing") {
    import spark.implicits._
    val df = Seq((0, Seq(1.0, 2.0, 3.0)), (0, Seq(1.0, 2.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VecAgg.vecSum(spark, col("v"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c =>
        c.getMessage != null && c.getMessage.contains("mixed vector lengths")),
      s"expected a mixed-vector-lengths failure, got: $e")
  }

  test("refineCentroids: a full-corpus Lloyd's pass never increases " +
      "quantization error, and moves sample-trained centroids") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val k = IvfKMeans.scaledK(emb.count())
    // bias the sample hard: train on 4x fewer points than the default
    val initial = IvfKMeans.trainCentroids(emb, k, sampleN = 8 * k)
    def err(c: Array[Array[Double]]): Double = {
      val flat = c
      IvfKMeans.assignCells(emb, flat)
        .select(col("embedding").cast("array<double>").as("v"), col("cell"))
        .collect().map { r =>
          val v = r.getSeq[Double](0)
          val cen = flat(r.getInt(1))
          v.indices.map(i => (v(i) - cen(i)) * (v(i) - cen(i))).sum
        }.sum
    }
    val e0 = err(initial)
    val refined = IvfKMeans.refineCentroids(emb, initial, iters = 2)
    val e1 = err(refined)
    assert(e1 <= e0 + 1e-6, s"refinement increased error: $e0 -> $e1")
    assert(e1 < e0 * 0.999, s"refinement did not move: $e0 -> $e1")
    // refinement must not change shape
    assert(refined.length === initial.length)
    assert(refined.head.length === initial.head.length)
  }
}
