package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 8-bit scalar quantization (SQ8) for embedding columns — the memory-side
  * half of the 100 TB ANN story (IVF partitions the corpus;
  * SQ8 shrinks each resident vector 8x: 64 B codes vs 512 B doubles).
  *
  * Train: per-dimension [lo, hi] ranges from a driver-side sample (same
  * TakeOrdered pattern as [[IvfKMeans]]); codes clamp, so out-of-sample
  * values degrade gracefully. Encode and first-pass scoring are custom
  * codegen'd Catalyst expressions ([[graft.functions.SQ8Encode]] /
  * [[graft.functions.SQ8Dot]] — asymmetric: the query stays full
  * precision). Search = quantized first pass over the whole corpus →
  * exact re-rank of the short candidate list.
  */
object Quantize {

  /** Per-dimension quantizer params. */
  final case class SQ8(lo: Array[Double], step: Array[Double])

  def train(emb: DataFrame, sampleN: Int = 2048): SQ8 = {
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val lo = Array.fill(dim)(Double.MaxValue)
    val hi = Array.fill(dim)(Double.MinValue)
    for (v <- sample; d <- 0 until dim) {
      if (v(d) < lo(d)) lo(d) = v(d)
      if (v(d) > hi(d)) hi(d) = v(d)
    }
    SQ8(lo, Array.tabulate(dim)(d => (hi(d) - lo(d)) / 255.0))
  }

  private def spark = org.apache.spark.sql.SparkSession.active

  /** (vec_id, codes, dqnrm): SQ8 codes per vector plus the DEQUANTIZED
    * norm (norm of the vector the codes decode back to — the consistent
    * denominator for first-pass cosine). Map-side only; the round-trip
    * HOF below runs once per corpus row at encode time, not per pair. */
  def encode(emb: DataFrame, sq: SQ8): DataFrame = {
    val lo = typedlit(sq.lo.toSeq)
    val step = typedlit(sq.step.toSeq)
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        graft.functions.VectorExpressions.sq8Encode(spark, col("v"), lo, step).as("codes"),
        roundTrip(col("v"), sq).as("dq"))
      .select(col("vec_id"), col("codes"),
        sqrt(Similarity.dot(col("dq"), col("dq"))).as("dqnrm"))
  }

  /** STREAMING encode-on-ingest: [[encode]] is a pure map-side projection
    * (codegen'd kernels, no shuffle, no state), so it applies to a
    * streaming DataFrame unchanged — quantize vectors as they arrive and
    * sink 64 B codes instead of 512 B doubles. The quantizer params come
    * from a batch-trained [[SQ8]] (train on yesterday's corpus, encode
    * today's stream); parity with the batch encode is pinned in
    * QuantizeSpec. */
  def encodeStream(emb: DataFrame, sq: SQ8): DataFrame = encode(emb, sq)

  /** Quantize-dequantize an array<double> in array land (same clamp/round
    * rules as [[graft.functions.SQ8Encode]]): the vector the codes decode
    * back to. */
  private def roundTrip(v: Column, sq: SQ8): Column =
    zip_with(v, typedlit(sq.lo.toSeq.zip(sq.step.toSeq)), (x, ls) => {
      val lo = ls.getField("_1")
      val st = ls.getField("_2")
      val c = least(lit(255.0), greatest(lit(0.0), round((x - lo) / st)))
      when(st === 0.0, lo).otherwise(lo + st * c)
    })

  /** Top-k cosine neighbors for each probe: quantized first pass over the
    * codes (broadcast probes, map-side scoring), keep `rerank` candidates
    * per probe, then exact re-rank on the original vectors — only
    * |probes| * rerank full-precision rows ever materialize. */
  def rerankTopK(
      emb: DataFrame, sq: SQ8, probeFilter: Column, k: Int, rerank: Int): DataFrame = {
    val lo = typedlit(sq.lo.toSeq)
    val step = typedlit(sq.step.toSeq)
    val p = Similarity.prepared(emb)
    val probes = p.where(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val corpus = encode(emb, sq)
    val approx = corpus.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("qnrm"),
        (graft.functions.VectorExpressions.sq8Dot(spark, col("qv"), col("codes"), lo, step)
          / (col("qnrm") * col("dqnrm"))).as("acos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("cid"))))
      .where(col("rn") <= rerank)
    val exact = approx
      .join(p.select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm")), "cid")
      .select(col("qid"), col("cid"),
        (Similarity.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos"))
    exact
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("sim"))
  }
}
