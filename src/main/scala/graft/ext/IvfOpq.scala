package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF x OPQ-rotated residual PQ — the full IVFADC+OPQ stack (Ge et al.'s
  * "Optimized Product Quantization" applied to Jégou et al.'s IVFADC): the
  * coarse quantizer absorbs each vector's cell component, and the residual
  * is rotated by a learned orthogonal R (trained on RESIDUALS with the full
  * alternating refinement) before PQ encoding, so the 8-byte code spends
  * its bits where residual variance actually lives.
  *
  * Identity used throughout: R orthogonal =>
  *   q . x_hat = q . c_cell + q . (R' y_hat) = q . c_cell + (R q) . y_hat,
  * so the ADC first pass rotates only the PROBE (one matvec per probe) and
  * scores codes directly in rotated space — per-corpus-row work identical
  * to plain IVFADC. Same plan shape as [[IvfPq]]: corpus shuffles once on
  * cell, probes explode nprobe-fold, exact re-rank on survivors only.
  * Training is bounded driver-side sample work, like every quantizer here. */
object IvfOpq {

  final case class Model(
      centroids: Array[Array[Double]], flat: Array[Double],
      opq: Opq.OPQ, rotT: Array[Double])

  private def spark = org.apache.spark.sql.SparkSession.active

  def train(
      emb: DataFrame, kCells: Int, m: Int = 8, kPq: Int = 16,
      sampleN: Int = 2048, iters: Int = 3): Model = {
    val centroids = IvfKMeans.trainCentroids(emb, kCells, sampleN)
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val residuals = sample.map { x =>
      var best = 0; var bestD = Double.MaxValue
      for (c <- centroids.indices) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = x(j) - centroids(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
      }
      Array.tabulate(dim)(j => x(j) - centroids(best)(j))
    }
    val opq = Opq.trainRefinedFromSample(residuals, m, kPq, iters)
    val rotT = new Array[Double](dim * dim)
    for (i <- 0 until dim; j <- 0 until dim)
      rotT(j * dim + i) = opq.rotation(i * dim + j)
    Model(centroids, centroids.flatten, opq, rotT)
  }

  private def cellVec(model: Model, cell: Column): Column = {
    val dim = model.centroids.head.length
    slice(typedlit(model.flat.toSeq), cell * dim + 1, lit(dim))
  }

  /** (vec_id, cell, codes, dqnrm): codes quantize R(v - c_cell); dqnrm is
    * the norm of the full reconstruction c_cell + R' dec(codes). */
  def encode(emb: DataFrame, model: Model): DataFrame = {
    val pq = model.opq.pq
    val cb = typedlit(pq.flat.toSeq)
    val V = graft.functions.VectorExpressions
    val recon = zip_with(
      cellVec(model, col("cell")),
      V.matVec(spark, typedlit(model.rotT.toSeq),
        V.pqDecode(spark, col("codes"), cb, pq.k, pq.dsub), model.opq.dim),
      (c, r) => c + r)
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"),
        V.ivfCell(spark, col("v"), typedlit(model.flat.toSeq), model.centroids.length)
          .as("cell"))
      .select(col("vec_id"), col("cell"),
        V.pqEncode(spark,
          V.matVec(spark, typedlit(model.opq.rotation.toSeq),
            zip_with(col("v"), cellVec(model, col("cell")), (x, c) => x - c),
            model.opq.dim),
          cb, pq.m, pq.k, pq.dsub).as("codes"))
      .select(col("vec_id"), col("cell"), col("codes"),
        sqrt(Similarity.dot(recon, recon)).as("dqnrm"))
  }

  /** Top-k cosine neighbors per probe over nprobe cells: rotated-residual
    * ADC first pass, exact re-rank. */
  def search(
      emb: DataFrame, model: Model, probeFilter: Column,
      nprobe: Int, k: Int, rerank: Int): DataFrame = {
    val pq = model.opq.pq
    val cb = typedlit(pq.flat.toSeq)
    val V = graft.functions.VectorExpressions
    val p = Similarity.prepared(emb)
    val corpus = encode(emb, model)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = p.where(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        Opq.rotate(model.opq, col("v")).as("rqv"),
        V.ivfCells(spark, col("v"), typedlit(model.flat.toSeq),
          model.centroids.length, math.min(nprobe, model.centroids.length)).as("cells"))
      .select(col("qid"), col("qv"), col("qnrm"), col("rqv"),
        explode(col("cells")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val approx = corpus.join(probes, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("qnrm"),
        ((Similarity.dot(col("qv"), cellVec(model, col("cell")))
          + V.pqDot(spark, col("rqv"), col("codes"), cb, pq.k, pq.dsub))
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
