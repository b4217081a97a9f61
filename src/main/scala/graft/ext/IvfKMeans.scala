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
    while (iter < maxIter && changed) {
      changed = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var j = 0
          while (j < dim) { val t = sample(i)(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; changed = true }
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
}
