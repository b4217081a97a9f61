package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse quantizer (SURVEY.md §2.9 similarity-search scale path).
  *
  * The 100 TB design: KMeans centroids are trained on a BOUNDED driver-side
  * sample (TakeOrdered — per-partition top-N, no full sort, no cluster-wide
  * iterative jobs), then cell assignment runs as a pure broadcast map-side
  * pass of codegen'd expressions (centroid literals + the native
  * [[graft.functions.DotProduct]]). Compare spark.ml KMeans, which drives
  * 2 jobs per Lloyd iteration over the full corpus — correct for model
  * fitting, wasteful for a coarse quantizer whose quality only needs a
  * sample. Deterministic: evenly-strided seed points from the id-ordered
  * sample, no RNG.
  */
object IvfKMeans {

  /** Lloyd's iterations over an in-memory sample. Empty clusters keep
    * their previous centroid. */
  private[ext] def lloyd(
      sample: Array[Array[Double]], k: Int, maxIter: Int): Array[Array[Double]] = {
    val n = sample.length
    val dim = sample.head.length
    val centroids = Array.tabulate(k)(i => sample(math.min(i * (n / k), n - 1)).clone())
    val assign = Array.fill(n)(-1)
    var iter = 0
    var changed = true
    val newAssign = new Array[Int](n)
    while (iter < maxIter && changed) {
      changed = false
      // the O(n·k·dim) assignment scan is the hot loop and every element
      // is independent — parallelize it across driver cores. Each slot of
      // newAssign is written by exactly one element and the per-element
      // arithmetic is untouched, so the result is BIT-identical to the
      // sequential loop (the float accumulations below stay sequential,
      // preserving summation order and thus exact centroid values).
      java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = sample(i)(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        newAssign(i) = best
      }
      var i = 0
      while (i < n) {
        if (assign(i) != newAssign(i)) { assign(i) = newAssign(i); changed = true }
        i += 1
      }
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0)
      var i2 = 0
      while (i2 < n) {
        val c = assign(i2); counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += sample(i2)(j); j += 1 }
        i2 += 1
      }
      var c2 = 0
      while (c2 < k) {
        if (counts(c2) > 0) {
          var j = 0
          while (j < dim) { centroids(c2)(j) = sums(c2)(j) / counts(c2); j += 1 }
        }
        c2 += 1
      }
      iter += 1
    }
    centroids
  }

  /** Train on a sample of `emb` (columns vec_id, embedding) and return the
    * centroids. */
  /** Cell count for a corpus of `n` vectors: ~sqrt(n), clamped. A FIXED
    * cell count is the classic IVF scaling mistake — corpus 10x => cell
    * population 10x => within-cell candidate pairs 100x (measured: the x10
    * amplified bench ran fixed-k IVF at ~n^2). With k ~ sqrt(n) the
    * within-cell search totals ~n^1.5 and assignment stays a map-side
    * broadcast pass. The cap bounds driver-side Lloyd's work; past it
    * (corpus >> 16M vectors) a hierarchical (two-level) coarse quantizer
    * is the standard continuation. */
  def scaledK(n: Long, minK: Int = 8, maxK: Int = 4096): Int =
    math.max(minK, math.min(maxK.toLong, math.round(math.sqrt(n.toDouble)))).toInt

  def trainCentroids(
      emb: DataFrame, k: Int, sampleN: Int = 2048, maxIter: Int = 10): Array[Array[Double]] = {
    val sample = emb
      .select(col("embedding").cast("array<double>").as("v"))
      .orderBy(col("vec_id"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    lloyd(sample, k, maxIter)
  }

  private def spark = org.apache.spark.sql.SparkSession.active

  private def flatLit(centroids: Array[Array[Double]]) =
    typedlit(centroids.flatten.toSeq)

  /** (vec_id, embedding, cell): nearest-centroid cell id per vector, fully
    * map-side (no shuffle, no job besides the sample collect). Assignment
    * runs through the [[graft.functions.IvfCell]] codegen kernel — one
    * generated loop over a flat centroid matrix, so generated-code size is
    * independent of k (the per-centroid expression-column formulation this
    * replaces collapsed once k scaled past a few dozen cells). */
  def assignCells(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorExpressions.ivfCell(
          spark, col("v"), flatLit(centroids), centroids.length).as("cell"))

  /** (vec_id, embedding, cells): the `nprobe` nearest cells ascending by
    * distance — the multi-probe path: a query probes several close cells,
    * recovering recall lost at cell boundaries for nprobe x candidate
    * volume. Same kernel family as [[assignCells]]; cells(0) == cell. */
  def probeCells(emb: DataFrame, centroids: Array[Array[Double]], nprobe: Int): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorExpressions.ivfCells(
          spark, col("v"), flatLit(centroids), centroids.length,
          math.min(nprobe, centroids.length)).as("cells"))

  /** DISTRIBUTED Lloyd's refinement: improve sample-trained centroids
    * with full-corpus iterations. Each iteration is one map-side
    * assignment scan ([[assignCells]], codegen kernel) + ONE aggregation
    * producing k (vector-sum, count) rows via the custom
    * [[graft.functions.VecSumAgg]] aggregate — partial aggregation sums
    * vectors map-side, so only k buffers of dim doubles cross the
    * shuffle and only k rows reach the driver (the same bounded-collect
    * contract as the sample training; empty cells keep their centroid).
    *
    * This is the 100 TB continuation of the sample-trained design: the
    * sample bounds what the DRIVER computes, while refinement spends
    * one full scan per iteration to remove the sample's bias — Lloyd's
    * update over the full data never increases full-corpus quantization
    * error (spec-pinned). Centroid values are deterministic only up to
    * float summation order; consumers are recall-gated, not hash-gated. */
  def refineCentroids(
      emb: DataFrame, centroids: Array[Array[Double]], iters: Int = 1)
      : Array[Array[Double]] = {
    var cents = centroids.map(_.clone())
    var it = 0
    while (it < iters) {
      val rows = assignCells(emb, cents)
        .groupBy("cell")
        .agg(
          graft.functions.VecAgg.vecSum(
            spark, col("embedding").cast("array<double>")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      rows.foreach { r =>
        val c = r.getInt(0)
        val s = r.getSeq[Double](1)
        val n = r.getLong(2).toDouble
        var j = 0
        while (j < cents(c).length) { cents(c)(j) = s(j) / n; j += 1 }
      }
      it += 1
    }
    cents
  }
}
