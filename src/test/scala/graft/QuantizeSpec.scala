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

  test("pq encode/adc-dot/normsq kernels match a Scala reimplementation") {
    import graft.ext.ProductQuantize
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(40)
    val pq = ProductQuantize.train(emb)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

    def centroid(s: Int, cid: Int): Array[Double] =
      Array.tabulate(pq.dsub)(j => pq.flat((s * pq.k + cid) * pq.dsub + j))
    def encodeRef(x: Array[Double]): Array[Byte] =
      Array.tabulate(pq.m) { s =>
        (0 until pq.k).minBy { cid =>
          val c = centroid(s, cid)
          (0 until pq.dsub).map(j => { val t = x(s * pq.dsub + j) - c(j); t * t }).sum
        }.toByte
      }

    val cb = typedlit(pq.flat.toSeq)
    val nsq = typedlit(pq.normSq.toSeq)
    val v = col("embedding").cast("array<double>")
    val got = emb.select(col("vec_id"), col("embedding"),
      VectorExpressions.pqEncode(spark, v, cb, pq.m, pq.k, pq.dsub).as("codes"))
      .withColumn("d", VectorExpressions.pqDot(spark, v, col("codes"), cb, pq.k, pq.dsub))
      .withColumn("n2", VectorExpressions.pqNormSq(spark, col("codes"), nsq, pq.k))
      .select("vec_id", "codes", "d", "n2")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1), r.getDouble(2), r.getDouble(3)))

    got.foreach { case (id, codes, d, n2) =>
      val x = vecs(id)
      assert(codes.toSeq === encodeRef(x).toSeq, s"codes for $id")
      var expDot = 0.0; var expN2 = 0.0
      for (s <- 0 until pq.m) {
        val c = centroid(s, codes(s) & 0xff)
        for (j <- 0 until pq.dsub) {
          expDot += x(s * pq.dsub + j) * c(j)
          expN2 += c(j) * c(j)
        }
      }
      assert(d === expDot, s"adc dot for $id")
      assert(math.abs(n2 - expN2) < 1e-12, s"normsq for $id")
    }
  }

  test("pq first pass + exact re-rank keeps useful recall at 64x compression") {
    import graft.ext.ProductQuantize
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val pq = ProductQuantize.train(emb)
    val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val reranked = ProductQuantize.rerankTopK(emb, pq, col("vec_id") < 10, k = 5, rerank = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(reranked.keySet === exact.keySet)
    val recalls = exact.map { case (q, ids) => (reranked(q) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    // 8 B/vector on RANDOM 64-dim vectors is a hostile regime; the bar is
    // "far better than chance" (chance: 25/~500 pool -> ~0.05), not SQ8's
    assert(mean >= 0.4, s"mean recall@5 = $mean")
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

  test("streaming encode-on-ingest produces the batch codes exactly") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val sq = Quantize.train(emb)
    val batchCodes = Quantize.encode(emb, sq)
      .collect().map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toMap

    // same vectors through a real stream (file source, AvailableNow)
    val schema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(sfDir)
      .select(col("vec_id"), col("embedding"))
    val encoded = Quantize.encodeStream(stream, sq)
    assert(encoded.isStreaming, "encode must stay a streaming frame")
    val q = encoded.writeStream.format("memory").queryName("sq8_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamCodes = spark.table("sq8_stream")
      .collect().map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toMap
    assert(streamCodes === batchCodes)
  }
}
