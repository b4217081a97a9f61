package graft

import graft.ext.{Quantize, Similarity}
import graft.functions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 scalar quantization: codegen kernels agree with their interpreted
  * eval and with a Scala reimplementation; quantized-first-pass + exact
  * re-rank recovers the exact brute-force top-k at high recall. */
class QuantizeSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sq8 encode/dot kernels match a Scala reimplementation") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(50)
    val sq = Quantize.train(emb)
    val rows = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")).collect()
    val vecs = rows.map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    val lo = typedlit(sq.lo.toSeq)
    val step = typedlit(sq.step.toSeq)
    val v = col("embedding").cast("array<double>")
    val got = emb.select(col("vec_id"), col("embedding"),
      VectorExpressions.sq8Encode(spark, v, lo, step).as("codes"))
      .withColumn("d", VectorExpressions.sq8Dot(spark, v, col("codes"), lo, step))
      .select("vec_id", "codes", "d")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2)))

    got.foreach { case (id, codes, d) =>
      val x = vecs(id)
      val expCodes = x.indices.map { i =>
        val c = if (sq.step(i) == 0.0) 0L
          else Math.round((x(i) - sq.lo(i)) / sq.step(i))
        Math.max(0L, Math.min(255L, c)).toByte
      }
      assert(codes.toSeq === expCodes, s"codes for $id")
      var expDot = 0.0
      for (i <- x.indices)
        expDot += x(i) * (sq.lo(i) + sq.step(i) * (codes(i) & 0xff))
      assert(d === expDot, s"dot for $id")
    }
  }

  test("sq8 first pass + exact re-rank recovers exact top-5 with high recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val sq = Quantize.train(emb)
    val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val reranked = Quantize.rerankTopK(emb, sq, col("vec_id") < 10, k = 5, rerank = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(reranked.keySet === exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      (reranked(q) & ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"mean recall@5 = $mean")
    // the re-rank step is exact, so every reported similarity must equal
    // the true cosine (spot-check via the exact result's pairs)
    val exactSims = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Quantize.rerankTopK(emb, sq, col("vec_id") < 10, k = 5, rerank = 15)
      .collect().foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        exactSims.get(key).foreach(s => assert(r.getDouble(2) === s, s"sim for $key"))
      }
  }
}
