package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OPQ — Optimized Product Quantization (parametric variant, Ge et al.,
  * CVPR 2013): learn an ORTHOGONAL rotation R before PQ so subspaces are
  * decorrelated and carry balanced variance, then product-quantize the
  * rotated vectors. PQ's independence assumption is exactly what
  * correlated embedding dims violate; the parametric OPQ closes most of
  * the gap with a closed-form R (no alternating minimization):
  *
  *  1. second-moment matrix S = X'X of the driver-side sample
  *     (uncentered: rotation must preserve dot products around the
  *     origin — cosine search — not around the mean);
  *  2. eigendecompose S (cyclic Jacobi — deterministic, ~64x64, driver);
  *  3. assign eigenvectors to the m subspaces balancing the PRODUCT of
  *     eigenvalues per bucket (greedy on log-eigenvalues, the paper's
  *     balanced-variance heuristic);
  *  4. R = the permuted eigenbasis. R is orthogonal: rotation preserves
  *     norms and dot products, so exact re-ranking on ORIGINAL vectors
  *     stays valid and the ADC scores approximate the same cosines.
  *
  * Scale shape: training is a bounded driver-side job (sample collect +
  * 64x64 eigen); rotating the corpus is one map-side pass through the
  * codegen'd [[graft.functions.MatVec]] kernel; everything downstream is
  * the proven PQ-ADC path. */
object Opq {

  /** Learned transform: rotation (flat row-major dim x dim) + codebooks
    * trained on rotated space. */
  final case class OPQ(rotation: Array[Double], dim: Int, pq: ProductQuantize.PQ)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as rows), unsorted. Deterministic. */
  private[graft] def jacobiEigen(
      aIn: Array[Array[Double]], sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    // v starts as identity; accumulates the product of rotations (columns
    // are eigenvectors; we return its TRANSPOSE as rows)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          off += a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            var j = 0
            while (j < n) {
              val apj = a(p)(j); val aqj = a(q)(j)
              a(p)(j) = c * apj - s * aqj
              a(q)(j) = s * apj + c * aqj
              val vjp = v(j)(p); val vjq = v(j)(q)
              v(j)(p) = c * vjp - s * vjq
              v(j)(q) = s * vjp + c * vjq
              j += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val values = Array.tabulate(n)(i => a(i)(i))
    val vectorsAsRows = Array.tabulate(n, n)((i, j) => v(j)(i))
    (values, vectorsAsRows)
  }

  /** Greedy balanced bucketing: eigen-directions sorted by descending
    * eigenvalue, each assigned to the non-full bucket with the smallest
    * log-eigenvalue sum — balances per-subspace variance products. */
  private[graft] def balancedBuckets(values: Array[Double], m: Int): Array[Array[Int]] = {
    val dim = values.length
    val dsub = dim / m
    val order = values.zipWithIndex.sortBy(-_._1).map(_._2)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logSum = Array.fill(m)(0.0)
    for (idx <- order) {
      val open = (0 until m).filter(buckets(_).length < dsub)
      val best = open.minBy(logSum(_))
      buckets(best) += idx
      logSum(best) += math.log(math.max(values(idx), 1e-300))
    }
    buckets.map(_.toArray)
  }

  private def collectSample(emb: DataFrame, sampleN: Int): Array[Array[Double]] =
    emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)

  def train(emb: DataFrame, m: Int = 8, k: Int = 16, sampleN: Int = 2048): OPQ =
    trainFromSample(collectSample(emb, sampleN), m, k)

  private def trainFromSample(sample: Array[Array[Double]], m: Int, k: Int): OPQ = {
    val dim = sample.head.length
    // uncentered second moment S = X'X / n
    val s = Array.fill(dim, dim)(0.0)
    for (x <- sample; i <- 0 until dim) {
      var j = i
      while (j < dim) { s(i)(j) += x(i) * x(j); j += 1 }
    }
    for (i <- 0 until dim; j <- 0 until i) s(i)(j) = s(j)(i)
    val (values, vectors) = jacobiEigen(s)
    val buckets = balancedBuckets(values, m)
    val rowOrder = buckets.flatten
    val rotation = new Array[Double](dim * dim)
    for ((srcRow, outRow) <- rowOrder.zipWithIndex; j <- 0 until dim)
      rotation(outRow * dim + j) = vectors(srcRow)(j)
    // train PQ codebooks in the rotated space
    val rotated = sample.map { x =>
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0; var j = 0
        while (j < dim) { acc += rotation(i * dim + j) * x(j); j += 1 }
        y(i) = acc; i += 1
      }
      y
    }
    OPQ(rotation, dim, ProductQuantize.trainOnSample(rotated, m, k))
  }

  // ---- non-parametric refinement (the full OPQ alternating loop) --------

  private def rotateVec(r: Array[Double], dim: Int, x: Array[Double]): Array[Double] = {
    val y = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += r(i * dim + j) * x(j); j += 1 }
      y(i) = acc; i += 1
    }
    y
  }

  private def encDec(pq: ProductQuantize.PQ, x: Array[Double]): Array[Double] = {
    val out = new Array[Double](pq.m * pq.dsub)
    var s = 0
    while (s < pq.m) {
      var best = 0; var bestD = Double.MaxValue
      var cid = 0
      while (cid < pq.k) {
        var d = 0.0; var j = 0
        val base = (s * pq.k + cid) * pq.dsub
        while (j < pq.dsub) {
          val t = x(s * pq.dsub + j) - pq.flat(base + j); d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = cid }
        cid += 1
      }
      val base = (s * pq.k + best) * pq.dsub
      var j = 0
      while (j < pq.dsub) { out(s * pq.dsub + j) = pq.flat(base + j); j += 1 }
      s += 1
    }
    out
  }

  private def qError(sample: Array[Array[Double]], opq: OPQ): Double =
    sample.map { x =>
      val y = rotateVec(opq.rotation, opq.dim, x)
      val yh = encDec(opq.pq, y)
      var e = 0.0; var j = 0
      while (j < opq.dim) { val t = y(j) - yh(j); e += t * t; j += 1 }
      e
    }.sum / sample.length

  /** Full (non-parametric) OPQ: start from the parametric solution and
    * alternate (1) retrain codebooks in the rotated space, (2) re-solve
    * the orthogonal Procrustes problem R = V U' from the SVD of
    * X' Y_hat (computed through [[jacobiEigen]] on the 64x64 Gram matrix
    * — still bounded driver work). Keeps the best-error iterate, so the
    * result never regresses below the parametric initialization. */
  def trainRefined(
      emb: DataFrame, m: Int = 8, k: Int = 16, sampleN: Int = 2048,
      iters: Int = 5): OPQ =
    trainRefinedFromSample(collectSample(emb, sampleN), m, k, iters)

  /** As [[trainRefined]] but from an explicit sample — lets [[IvfOpq]]
    * train the rotation on coarse-quantizer RESIDUALS. */
  private[ext] def trainRefinedFromSample(
      sample: Array[Array[Double]], m: Int, k: Int, iters: Int): OPQ = {
    val dim = sample.head.length
    var cur = trainFromSample(sample, m, k)
    var best = cur
    var bestErr = qError(sample, cur)
    var it = 0
    var degenerate = false
    while (it < iters && !degenerate) {
      // reconstructions of the CURRENT rotation's codes, in rotated space
      val yHat = sample.map(x => encDec(cur.pq, rotateVec(cur.rotation, dim, x)))
      // M = X' Y_hat (d x d)
      val mMat = Array.fill(dim, dim)(0.0)
      for (n <- sample.indices; i <- 0 until dim) {
        val xi = sample(n)(i)
        if (xi != 0.0) {
          var j = 0
          while (j < dim) { mMat(i)(j) += xi * yHat(n)(j); j += 1 }
        }
      }
      // SVD via eigen of M'M = V S^2 V'; U = M V / sigma
      val mtm = Array.fill(dim, dim)(0.0)
      for (i <- 0 until dim; j <- i until dim) {
        var acc = 0.0; var r = 0
        while (r < dim) { acc += mMat(r)(i) * mMat(r)(j); r += 1 }
        mtm(i)(j) = acc; mtm(j)(i) = acc
      }
      val (lambda, vRows) = jacobiEigen(mtm)
      val lmax = lambda.max
      if (lambda.exists(_ <= lmax * 1e-14)) degenerate = true
      else {
        val rot = new Array[Double](dim * dim)
        for (idx <- 0 until dim) {
          val v = vRows(idx)
          val sigma = math.sqrt(math.max(lambda(idx), 0.0))
          // u = M v / sigma
          val u = Array.tabulate(dim) { r =>
            var acc = 0.0; var c = 0
            while (c < dim) { acc += mMat(r)(c) * v(c); c += 1 }
            acc / sigma
          }
          // R = V U': R[a][b] += v[a] * u[b]
          for (a <- 0 until dim; b <- 0 until dim)
            rot(a * dim + b) += v(a) * u(b)
        }
        // retrain codebooks under the new rotation
        val rotated = sample.map(x => rotateVec(rot, dim, x))
        cur = OPQ(rot, dim, ProductQuantize.trainOnSample(rotated, m, k))
        val err = qError(sample, cur)
        if (err < bestErr) { bestErr = err; best = cur }
      }
      it += 1
    }
    best
  }

  private def spark = org.apache.spark.sql.SparkSession.active

  /** Rotate an array<double> column by the learned R (map-side codegen). */
  def rotate(opq: OPQ, v: Column): Column =
    graft.functions.VectorExpressions.matVec(
      spark, typedlit(opq.rotation.toSeq), v, opq.dim)

  /** (vec_id, codes, dqnrm): PQ codes of the ROTATED vector. R is
    * orthogonal, so the reconstruction norm in rotated space equals the
    * reconstruction norm in original space — dqnrm stays the right cosine
    * denominator. */
  def encode(emb: DataFrame, opq: OPQ): DataFrame = {
    val pq = opq.pq
    val cb = typedlit(pq.flat.toSeq)
    val nsq = typedlit(pq.normSq.toSeq)
    emb
      .select(col("vec_id"),
        rotate(opq, col("embedding").cast("array<double>")).as("rv"))
      .select(col("vec_id"),
        graft.functions.VectorExpressions.pqEncode(spark, col("rv"), cb, pq.m, pq.k, pq.dsub)
          .as("codes"))
      .select(col("vec_id"), col("codes"),
        sqrt(graft.functions.VectorExpressions.pqNormSq(spark, col("codes"), nsq, pq.k))
          .as("dqnrm"))
  }

  /** Top-k cosine neighbors per probe: rotated-space PQ-ADC first pass,
    * exact re-rank on the ORIGINAL vectors (valid because R preserves dot
    * products and norms). Same plan shape as [[ProductQuantize.rerankTopK]]
    * — probes broadcast, corpus streams as codes. */
  def rerankTopK(
      emb: DataFrame, opq: OPQ, probeFilter: Column, k: Int, rerank: Int): DataFrame = {
    val pq = opq.pq
    val cb = typedlit(pq.flat.toSeq)
    val p = Similarity.prepared(emb)
    val probes = p.where(probeFilter)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"),
        rotate(opq, col("v")).as("rqv"))
    val corpus = encode(emb, opq)
    val approx = corpus.crossJoin(broadcast(probes))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("qv"), col("qnrm"),
        (graft.functions.VectorExpressions.pqDot(spark, col("rqv"), col("codes"), cb, pq.k, pq.dsub)
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
