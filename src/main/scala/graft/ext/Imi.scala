package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted multi-index (IMI, Babenko & Lempitsky "The Inverted
  * Multi-Index"): quantize the two HALVES of each vector independently
  * against per-half codebooks of k centroids; the cell id is the pair
  * (code0, code1) — k^2 effective cells from only 2k centroids.
  *
  * This is the scale continuation past flat IVF's cap
  * ([[IvfKMeans.scaledK]] tops out where driver-side Lloyd's stops being
  * reasonable, ~4096 cells): k = 4096 per half already addresses 16M
  * effective cells, enough to keep cell populations bounded at
  * billion-vector corpora, while TRAINING cost stays two half-space
  * Lloyd's runs over the same driver sample (it reuses
  * [[ProductQuantize.trainOnSample]] with m = 2 — IMI is exactly PQ with
  * two subspaces used for partitioning instead of compression).
  *
  * Search is the same cell-equi-join shape as [[Similarity.multiProbeNN]]:
  * the corpus keeps one row per vector in its own cell, probes explode to
  * perHalf^2 candidate cells (top-perHalf codes per half, crossed), and
  * only cell-mates are scored. */
object Imi {

  /** k centroids per half over dsub = dim/2 coordinates; flat [2][k][dsub]. */
  final case class Model(k: Int, dsub: Int, flat: Array[Double])

  private def spark = org.apache.spark.sql.SparkSession.active

  /** Codes per half for a corpus of n vectors: n^(1/4) keeps E[cell
    * population] = sqrt(n) with k^2 cells, mirroring flat IVF's sqrt(n)
    * rule one level up. */
  def scaledK(n: Long, minK: Int = 4, maxK: Int = 4096): Int =
    math.max(minK.toLong, math.min(maxK.toLong,
      math.round(math.pow(n.toDouble, 0.25)))).toInt

  def train(emb: DataFrame, k: Int, sampleN: Int = 2048): Model = {
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val pq = ProductQuantize.trainOnSample(sample, m = 2, k = k)
    Model(k, pq.dsub, pq.flat)
  }

  /** (vec_id, embedding, cell): combined half-code cell id, map-side. */
  def assign(emb: DataFrame, model: Model): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorExpressions.imiCell(
          spark, col("v"), typedlit(model.flat.toSeq), model.k, model.dsub).as("cell"))

  /** Top-k cosine neighbors via the multi-probed IMI grid. `probeFilter`
    * restricts the probe side only — the corpus side always indexes every
    * vector (self-search = the default `lit(true)`). */
  def nn(emb: DataFrame, model: Model, perHalf: Int, k: Int,
         probeFilter: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val cbLit = typedlit(model.flat.toSeq)
    val corpus = assign(emb, model)
      .select(col("vec_id").as("cid"), col("cell"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cnrm", sqrt(Similarity.dot(col("cv"), col("cv"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = emb.where(probeFilter)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qnrm", sqrt(Similarity.dot(col("qv"), col("qv"))))
      .withColumn("cells", graft.functions.VectorExpressions.imiCells(
        spark, col("qv"), cbLit, model.k, model.dsub, perHalf))
      .select(col("qid"), col("qv"), col("qnrm"), explode(col("cells")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sims = corpus.join(probes, Seq("cell"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (Similarity.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos"))
    val topk = sims
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("cid").as("nn_id"), round(col("cos"), 6).as("sim"))
    val out = Lineage.cut(topk)
    corpus.unpersist()
    probes.unpersist()
    out
  }
}
