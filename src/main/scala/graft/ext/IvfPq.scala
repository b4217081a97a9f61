package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF x PQ composition — IVFADC (Jégou et al.): the coarse quantizer
  * partitions the corpus into cells AND absorbs the coarse component of
  * every vector, so PQ only has to encode the RESIDUAL (v - centroid),
  * which has far less variance than v itself — the same 8-byte code
  * quantizes much tighter. This is the canonical billion-scale ANN layout:
  *
  *  - corpus at rest: (cell, 8 B residual codes, reconstruction norm) —
  *    64x smaller than raw doubles, partitioned by cell;
  *  - search: probe nprobe nearest cells (codegen'd [[graft.functions.IvfCells]]),
  *    score candidates cell-locally with ADC
  *    (q . x_hat = q . centroid_cell + q . dec(codes), the first term via a
  *    builtin slice of the flat centroid matrix, the second via the
  *    [[graft.functions.PQAdcDot]] kernel), exact re-rank of the survivors;
  *  - one shuffle on cell for the corpus, probes explode nprobe-fold.
  *
  * Training is bounded driver-side work (sample collect, Lloyd's for
  * centroids, Lloyd's per subspace on residuals). */
object IvfPq {

  final case class Model(
      centroids: Array[Array[Double]], flat: Array[Double], pq: ProductQuantize.PQ)

  private def spark = org.apache.spark.sql.SparkSession.active

  def train(
      emb: DataFrame, kCells: Int, m: Int = 8, kPq: Int = 16,
      sampleN: Int = 2048): Model = {
    val centroids = IvfKMeans.trainCentroids(emb, kCells, sampleN)
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    // per-sample residual assignment is independent element-wise:
    // parallel over driver cores, bit-identical to the sequential map
    val residuals = new Array[Array[Double]](sample.length)
    java.util.stream.IntStream.range(0, sample.length).parallel().forEach { i =>
      val x = sample(i)
      var best = 0; var bestD = Double.MaxValue
      for (c <- centroids.indices) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = x(j) - centroids(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
      }
      residuals(i) = Array.tabulate(dim)(j => x(j) - centroids(best)(j))
    }
    Model(centroids, centroids.flatten, ProductQuantize.trainOnSample(residuals, m, kPq))
  }

  /** The probed/assigned cell's centroid as an array column: a builtin
    * `slice` into the flat literal matrix (codegen'd, no kernel needed). */
  private def cellVec(model: Model, cell: Column): Column = {
    val dim = model.centroids.head.length
    slice(typedlit(model.flat.toSeq), cell * dim + 1, lit(dim))
  }

  /** (vec_id, cell, codes, dqnrm): cell id, residual PQ codes, and the
    * norm of the reconstruction centroid + dec(codes) — the cosine
    * denominator of the first pass. */
  def encode(emb: DataFrame, model: Model): DataFrame = {
    val pq = model.pq
    val cb = typedlit(pq.flat.toSeq)
    val V = graft.functions.VectorExpressions
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        V.ivfCell(spark, col("v"), typedlit(model.flat.toSeq), model.centroids.length)
          .as("cell"))
      .select(col("vec_id"), col("cell"),
        V.pqEncode(spark,
          zip_with(col("v"), cellVec(model, col("cell")), (x, c) => x - c),
          cb, pq.m, pq.k, pq.dsub).as("codes"))
      .select(col("vec_id"), col("cell"), col("codes"),
        sqrt(Similarity.dot(
          zip_with(cellVec(model, col("cell")),
            V.pqDecode(spark, col("codes"), cb, pq.k, pq.dsub), (c, r) => c + r),
          zip_with(cellVec(model, col("cell")),
            V.pqDecode(spark, col("codes"), cb, pq.k, pq.dsub), (c, r) => c + r)))
          .as("dqnrm"))
  }

  /** Top-k cosine neighbors per probe over the probed cells: ADC first
    * pass (q.centroid + q.dec(residual codes)), exact re-rank. */
  def search(
      emb: DataFrame, model: Model, probeFilter: Column,
      nprobe: Int, k: Int, rerank: Int): DataFrame = {
    val pq = model.pq
    val cb = typedlit(pq.flat.toSeq)
    val V = graft.functions.VectorExpressions
    val p = Similarity.prepared(emb)
    // corpus: one row per vector in ITS cell; persist — cell is an
    // expression-derived join key (see Similarity.multiProbeNN)
    val corpus = encode(emb, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = p.where(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        V.ivfCells(spark, col("v"), typedlit(model.flat.toSeq),
          model.centroids.length, math.min(nprobe, model.centroids.length)).as("cells"))
      .select(col("qid"), col("qv"), col("qnrm"), explode(col("cells")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val approx = corpus.join(probes, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("qnrm"),
        ((Similarity.dot(col("qv"), cellVec(model, col("cell")))
          + V.pqDot(spark, col("qv"), col("codes"), cb, pq.k, pq.dsub))
          / (col("qnrm") * col("dqnrm"))).as("acos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("cid"))))
      .where(col("rn") <= rerank)
    val out = approx
      .join(p.select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm")), "cid")
      .select(col("qid"), col("cid"),
        (Similarity.dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("sim"))
    val res = Lineage.cut(out)
    corpus.unpersist()
    probes.unpersist()
    res
  }
}
