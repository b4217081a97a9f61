package graft

import graft.ext.{IvfKMeans, IvfPq, ProductQuantize, Similarity}
import graft.functions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF x PQ residual composition: decode kernel matches a Scala
  * reimplementation, residual quantization reconstructs tighter than
  * whole-vector PQ, and cell-local ADC search + exact re-rank keeps
  * useful recall against brute force. */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("pq decode kernel matches a Scala reimplementation") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(64)
    val pq = ProductQuantize.train(emb)
    val cb = typedlit(pq.flat.toSeq)
    val got = ProductQuantize.encode(emb, pq)
      .select(col("vec_id"), col("codes"),
        VectorExpressions.pqDecode(spark, col("codes"), cb, pq.k, pq.dsub).as("dec"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val codes = r.getAs[Array[Byte]]("codes")
      val dec = r.getSeq[Double](2).toArray
      for (s <- 0 until pq.m; j <- 0 until pq.dsub) {
        val expect = pq.flat(((s * pq.k) + (codes(s) & 0xff)) * pq.dsub + j)
        assert(dec(s * pq.dsub + j) === expect, s"sub=$s dim=$j")
      }
    }
  }

  test("residual quantization error < whole-vector PQ error") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(256).collect().map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val plain = ProductQuantize.trainOnSample(sample, 8, 16)
    val model = IvfPq.train(emb, kCells = 8, sampleN = 256)

    def encDec(pq: ProductQuantize.PQ, x: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      for (s <- 0 until pq.m) {
        var best = 0; var bestD = Double.MaxValue
        for (cid <- 0 until pq.k) {
          var d = 0.0
          val base = (s * pq.k + cid) * pq.dsub
          for (j <- 0 until pq.dsub) {
            val t = x(s * pq.dsub + j) - pq.flat(base + j); d += t * t
          }
          if (d < bestD) { bestD = d; best = cid }
        }
        val base = (s * pq.k + best) * pq.dsub
        for (j <- 0 until pq.dsub) out(s * pq.dsub + j) = pq.flat(base + j)
      }
      out
    }
    def sq(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val plainErr = sample.map(x => sq(x, encDec(plain, x))).sum / sample.length
    val residErr = sample.map { x =>
      var best = 0; var bestD = Double.MaxValue
      for (c <- model.centroids.indices) {
        var d = 0.0
        for (j <- 0 until dim) { val t = x(j) - model.centroids(c)(j); d += t * t }
        if (d < bestD) { bestD = d; best = c }
      }
      val r = Array.tabulate(dim)(j => x(j) - model.centroids(best)(j))
      val rhat = encDec(model.pq, r)
      val recon = Array.tabulate(dim)(j => model.centroids(best)(j) + rhat(j))
      sq(x, recon)
    }.sum / sample.length
    assert(residErr < plainErr, s"residual=$residErr plain=$plainErr")
    info(f"reconstruction error: plain=$plainErr%.4f ivfpq=$residErr%.4f (${100 * (1 - residErr / plainErr)}%.1f%% lower)")
  }

  test("ivfpq search recovers exact top-5 with useful recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val model = IvfPq.train(emb, kCells = IvfKMeans.scaledK(emb.count()))
    val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = IvfPq.search(emb, model, col("vec_id") < 10, nprobe = 4, k = 5, rerank = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 = $mean")
  }
}
