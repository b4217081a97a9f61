package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the classic ANN
  * sketch (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search"): split each vector into `m` subspaces, k-means each subspace
  * on a driver-side sample, store one centroid id byte per subspace.
  * m=8 over 64 dims = 8 B/vector (64x smaller than doubles; vs 8x for
  * [[Quantize]] SQ8) at coarser precision — PQ is what makes a 100 TB
  * corpus fit a cluster's memory for first-pass scanning.
  *
  * Scoring is asymmetric (ADC): the query stays full precision and the
  * [[graft.functions.PQAdcDot]] kernel accumulates q_sub . centroid[code]
  * per subspace. Cosine uses the exact reconstruction norm:
  * subspaces are disjoint coordinates, so ||recon||^2 decomposes into a
  * per-(sub, centroid) table lookup ([[graft.functions.PQNormSq]]).
  * Search = PQ first pass over the corpus -> exact re-rank of the short
  * candidate list on the original vectors.
  */
object ProductQuantize {

  /** Trained codebook: flat [sub][centroid][dim] layout + the matching
    * per-(sub, centroid) squared-norm table. */
  final case class PQ(m: Int, k: Int, dsub: Int, flat: Array[Double], normSq: Array[Double])

  def train(emb: DataFrame, m: Int = 8, k: Int = 16, sampleN: Int = 2048): PQ = {
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    trainOnSample(sample, m, k)
  }

  /** Codebook training from an already-collected sample — shared with the
    * OPQ path ([[Opq]]), which rotates the sample first. */
  private[graft] def trainOnSample(sample: Array[Array[Double]], m: Int, k: Int): PQ = {
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val flat = new Array[Double](m * k * dsub)
    val normSq = new Array[Double](m * k)
    // subspaces are independent k-means problems writing disjoint ranges
    // of flat/normSq — parallel over driver cores, bit-identical per
    // subspace to the sequential loop
    java.util.stream.IntStream.range(0, m).parallel().forEach { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val centroids = IvfKMeans.lloyd(sub, k, maxIter = 10)
      for (cid <- 0 until k) {
        var nsq = 0.0
        for (j <- 0 until dsub) {
          flat((s * k + cid) * dsub + j) = centroids(cid)(j)
          nsq += centroids(cid)(j) * centroids(cid)(j)
        }
        normSq(s * k + cid) = nsq
      }
    }
    PQ(m, k, dsub, flat, normSq)
  }

  private def spark = org.apache.spark.sql.SparkSession.active

  /** (vec_id, codes, dqnrm): m-byte PQ codes + exact reconstruction norm.
    * Map-side only. */
  def encode(emb: DataFrame, pq: PQ): DataFrame = {
    val cb = typedlit(pq.flat.toSeq)
    val nsq = typedlit(pq.normSq.toSeq)
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        graft.functions.VectorExpressions.pqEncode(spark, col("v"), cb, pq.m, pq.k, pq.dsub)
          .as("codes"))
      .select(col("vec_id"), col("codes"),
        sqrt(graft.functions.VectorExpressions.pqNormSq(spark, col("codes"), nsq, pq.k))
          .as("dqnrm"))
  }

  /** Top-k cosine neighbors per probe: PQ-ADC first pass over the codes,
    * `rerank` candidates per probe, exact re-rank on original vectors. */
  def rerankTopK(
      emb: DataFrame, pq: PQ, probeFilter: Column, k: Int, rerank: Int): DataFrame = {
    val cb = typedlit(pq.flat.toSeq)
    val p = Similarity.prepared(emb)
    val probes = p.where(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val corpus = encode(emb, pq)
    val approx = corpus.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("qnrm"),
        (graft.functions.VectorExpressions.pqDot(spark, col("qv"), col("codes"), cb, pq.k, pq.dsub)
          / (col("qnrm") * col("dqnrm"))).as("acos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("cid"))))
      .where(col("rn") <= rerank)
    approx
      .join(p.select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm")), "cid")
      .select(col("qid"), col("cid"),
        (Similarity.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("sim"))
  }
}
