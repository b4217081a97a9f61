package graft

import graft.ext.{IvfKMeans, IvfOpq, IvfPq, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF x OPQ residual composition: the residual rotation is orthogonal,
  * rotating residuals before PQ reconstructs at least as tight as plain
  * IVFADC (refinement keeps the best iterate), the encode/search identity
  * q.x_hat = q.c + (Rq).y_hat holds column-side, and recall stays useful. */
class IvfOpqSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("residual rotation is orthogonal (R R' = I) and rotT is its transpose") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val model = IvfOpq.train(emb, kCells = 8, sampleN = 256, iters = 2)
    val d = model.opq.dim
    val r = model.opq.rotation
    for (i <- 0 until d; j <- 0 until d) {
      var acc = 0.0
      for (k <- 0 until d) acc += r(i * d + k) * r(j * d + k)
      assert(math.abs(acc - (if (i == j) 1.0 else 0.0)) < 1e-8, s"RR'[$i][$j]=$acc")
      assert(model.rotT(j * d + i) === r(i * d + j))
    }
  }

  test("rotated-residual reconstruction <= plain IVFADC residual reconstruction") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(256).collect().map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val plain = IvfPq.train(emb, kCells = 8, sampleN = 256)
    val opqM = IvfOpq.train(emb, kCells = 8, sampleN = 256, iters = 3)

    def encDec(pq: graft.ext.ProductQuantize.PQ, x: Array[Double]): Array[Double] = {
      val out = new Array[Double](dim)
      for (s <- 0 until pq.m) {
        var best = 0; var bestD = Double.MaxValue
        for (cid <- 0 until pq.k) {
          var dd = 0.0
          val base = (s * pq.k + cid) * pq.dsub
          for (j <- 0 until pq.dsub) {
            val t = x(s * pq.dsub + j) - pq.flat(base + j); dd += t * t
          }
          if (dd < bestD) { bestD = dd; best = cid }
        }
        val base = (s * pq.k + best) * pq.dsub
        for (j <- 0 until pq.dsub) out(s * pq.dsub + j) = pq.flat(base + j)
      }
      out
    }
    def nearest(cs: Array[Array[Double]], x: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      for (c <- cs.indices) {
        var d = 0.0
        for (j <- 0 until dim) { val t = x(j) - cs(c)(j); d += t * t }
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    def mul(m: Array[Double], x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0
        for (j <- 0 until dim) acc += m(i * dim + j) * x(j)
        acc
      }
    def sq(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum

    val plainErr = sample.map { x =>
      val c = plain.centroids(nearest(plain.centroids, x))
      val r = Array.tabulate(dim)(j => x(j) - c(j))
      val rhat = encDec(plain.pq, r)
      sq(x, Array.tabulate(dim)(j => c(j) + rhat(j)))
    }.sum / sample.length
    val opqErr = sample.map { x =>
      val c = opqM.centroids(nearest(opqM.centroids, x))
      val r = Array.tabulate(dim)(j => x(j) - c(j))
      val yhat = encDec(opqM.opq.pq, mul(opqM.opq.rotation, r))
      val rhat = mul(opqM.rotT, yhat)
      sq(x, Array.tabulate(dim)(j => c(j) + rhat(j)))
    }.sum / sample.length
    // both models share the same centroid trainer; the OPQ refinement keeps
    // its best iterate, so rotated residuals can't reconstruct much worse —
    // and on this corpus reconstruct strictly better
    assert(opqErr < plainErr, s"opq=$opqErr plain=$plainErr")
    info(f"reconstruction error: ivfpq=$plainErr%.4f ivfopq=$opqErr%.4f (${100 * (1 - opqErr / plainErr)}%.1f%% lower)")
  }

  test("encode dqnrm equals the driver-side reconstruction norm") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(64)
    val model = IvfOpq.train(emb, kCells = 4, sampleN = 64, iters = 1)
    val dim = model.opq.dim
    val pq = model.opq.pq
    val rows = IvfOpq.encode(emb, model).collect()
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def mul(m: Array[Double], x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0
        for (j <- 0 until dim) acc += m(i * dim + j) * x(j)
        acc
      }
    rows.foreach { r =>
      val cell = r.getInt(1)
      val codes = r.getAs[Array[Byte]]("codes")
      val dqnrm = r.getDouble(3)
      val yhat = Array.tabulate(dim) { j =>
        val s = j / pq.dsub
        pq.flat(((s * pq.k) + (codes(s) & 0xff)) * pq.dsub + (j % pq.dsub))
      }
      val rhat = mul(model.rotT, yhat)
      val recon = Array.tabulate(dim)(j => model.centroids(cell)(j) + rhat(j))
      val expect = math.sqrt(recon.map(v => v * v).sum)
      assert(math.abs(dqnrm - expect) < 1e-9, s"vec ${r.getLong(0)}")
    }
    assert(rows.nonEmpty)
  }

  test("ivfopq search recovers exact top-5 with useful recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val model = IvfOpq.train(emb, kCells = IvfKMeans.scaledK(emb.count()))
    val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = IvfOpq.search(emb, model, col("vec_id") < 10, nprobe = 4, k = 5, rerank = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 = $mean")
  }
}
