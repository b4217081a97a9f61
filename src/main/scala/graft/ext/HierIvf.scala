package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchical (two-level) IVF coarse quantizer — the continuation past
  * flat IVF's driver-trainable cell cap, sibling of the product-structured
  * [[Imi]]: k1 top-level centroids each own k2 sub-centroids trained on
  * their OWN sample residents, giving k1·k2 effective cells from k1+k1·k2
  * driver-trained centroids whose Lloyd's passes each see only a cell's
  * residents (so per-cell training cost shrinks as k1 grows — at a
  * billion-vector corpus, 1k top cells x 1k sub cells = 1M effective
  * cells from bounded driver work, where flat Lloyd's at k = 1M is
  * unrunnable). Unlike the IMI's independent halves, the sub-codebooks
  * here are RESIDENT-CONDITIONED: each refines the actual data
  * distribution inside its parent cell, the structure a real deployment
  * (e.g. a two-level FAISS IVF tree) uses.
  *
  * Assignment stays a pure map-side kernel pass with generated-code size
  * independent of k1·k2: level 1 is one [[graft.functions.IvfCell]] call
  * over the flat top matrix; level 2 SLICES the row's sub-codebook out of
  * one big flat literal (k1·k2·dim doubles, shipped once per executor)
  * and runs the same kernel over it — no per-cell expression columns, no
  * k-dependent codegen. cell = c1·k2 + c2. */
object HierIvf {

  /** subFlat layout: centroid (c1, c2) occupies
    * [(c1·k2 + c2)·dim, +dim) — c1-major, so a row's sub-codebook is one
    * contiguous slice. */
  final case class Model(
      k1: Int, k2: Int, dim: Int,
      topFlat: Array[Double], subFlat: Array[Double])

  /** Level sizes for a corpus of `n` vectors: both levels ~n^(1/4), so
    * effective cells track flat IVF's ~sqrt(n) rule while per-level
    * driver training stays tiny. */
  def scaledKs(n: Long, minK: Int = 4, maxK: Int = 1024): (Int, Int) = {
    val k = math.max(minK,
      math.min(maxK.toLong, math.round(math.pow(n.toDouble, 0.25)))).toInt
    (k, k)
  }

  def train(
      emb: DataFrame, k1: Int, k2: Int, sampleN: Int = 4096,
      maxIter: Int = 10): Model = {
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val dim = sample.head.length
    val top = IvfKMeans.lloyd(sample, k1, maxIter)
    def nearestTop(x: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k1) {
        var d = 0.0; var j = 0
        while (j < dim) { val t = x(j) - top(c)(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val residents = sample.groupBy(nearestTop)
    val subFlat = new Array[Double](k1 * k2 * dim)
    var c1 = 0
    while (c1 < k1) {
      // cells with no sample residents inherit their top centroid for
      // every sub — correct (any vector landing there scores identically
      // against all k2 subs and takes sub 0)
      val subs = residents.get(c1) match {
        case Some(rs) if rs.nonEmpty => IvfKMeans.lloyd(rs, k2, maxIter)
        case _ => Array.fill(k2)(top(c1).clone())
      }
      var c2 = 0
      while (c2 < k2) {
        System.arraycopy(subs(c2), 0, subFlat, (c1 * k2 + c2) * dim, dim)
        c2 += 1
      }
      c1 += 1
    }
    Model(k1, k2, dim, top.flatten, subFlat)
  }

  private def spark = org.apache.spark.sql.SparkSession.active

  private def subSlice(m: Model, c1: Column): Column =
    slice(typedlit(m.subFlat.toSeq), c1 * (m.k2 * m.dim) + 1, lit(m.k2 * m.dim))

  /** (vec_id, embedding, cell): two kernel passes, zero shuffle.
    * cell = c1·k2 + c2. */
  def assignCells(emb: DataFrame, m: Model): DataFrame = {
    val V = graft.functions.VectorExpressions
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("__c1",
        V.ivfCell(spark, col("v"), typedlit(m.topFlat.toSeq), m.k1))
      .select(col("vec_id"), col("embedding"),
        (col("__c1") * m.k2 + V.ivfCell(
          spark, col("v"), subSlice(m, col("__c1")), m.k2)).as("cell"))
  }

  /** (vec_id, embedding, cells): the nprobeTop·nprobeSub nearest effective
    * cells — the nprobeSub closest subs inside each of the nprobeTop
    * closest top cells. */
  def probeCells(
      emb: DataFrame, m: Model, nprobeTop: Int, nprobeSub: Int): DataFrame = {
    val V = graft.functions.VectorExpressions
    val pt = math.min(nprobeTop, m.k1)
    val ps = math.min(nprobeSub, m.k2)
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("__t",
        V.ivfCells(spark, col("v"), typedlit(m.topFlat.toSeq), m.k1, pt))
      .select(col("vec_id"), col("embedding"),
        flatten(transform(col("__t"), c1 =>
          transform(
            V.ivfCells(spark, col("v"), subSlice(m, c1), m.k2, ps),
            c2 => c1 * m.k2 + c2))).as("cells"))
  }

  /** Top-k cosine neighbors with the two-level quantizer — same
    * cell-equi-join shape as [[Similarity.multiProbeNN]]: corpus side one
    * row per vector (its effective cell, one shuffle on cell), probe side
    * explodes to its probed cells. */
  def nn(
      emb: DataFrame, m: Model, k: Int,
      probeFilter: Column = lit(true), nprobeTop: Int = 2,
      nprobeSub: Int = 2): DataFrame = {
    val dot = Similarity.dot _
    val corpus = assignCells(emb, m)
      .select(col("vec_id").as("cid"), col("cell"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = probeCells(emb.where(probeFilter), m, nprobeTop, nprobeSub)
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"), col("cells"))
      .withColumn("qnrm", sqrt(dot(col("qv"), col("qv"))))
      .select(col("qid"), col("qv"), col("qnrm"), explode(col("cells")).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val topk = corpus.join(probes, Seq("cell"))
      .where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos"))
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
