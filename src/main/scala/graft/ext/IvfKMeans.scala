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

  /** Squared-L2 distance columns to each centroid for a materialized
    * array<double> column `v`: ||c||^2 - 2 v.c (the ||v||^2 term is
    * constant per row and cancels in argmin). */
  private def distCols(v: org.apache.spark.sql.Column, centroids: Array[Array[Double]]) =
    centroids.map { c =>
      val cNormSq = c.map(x => x * x).sum
      lit(cNormSq) - lit(2.0) * Similarity.dot(v, typedlit(c.toSeq))
    }

  /** (vec_id, embedding, d): per-row centroid-distance array, materialized
    * through its own projection so downstream argmin/sort references reuse
    * it instead of re-inlining the k x dim literal dot products (which
    * both bloats codegen ~3x and re-evaluates the dots per reference). */
  private def withDists(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("embedding"),
        array(distCols(col("v"), centroids): _*).as("d"))

  /** (vec_id, embedding, cell): nearest-centroid cell id per vector, fully
    * map-side (no shuffle, no job besides the sample collect). */
  def assignCells(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    withDists(emb, centroids)
      .select(
        col("vec_id"), col("embedding"),
        (array_position(col("d"), array_min(col("d"))) - 1).cast("int").as("cell"))

  /** (vec_id, embedding, cells): the `nprobe` nearest cells ascending by
    * distance — the multi-probe path: a query probes several close cells,
    * recovering recall lost at cell boundaries for nprobe x candidate
    * volume. */
  def probeCells(emb: DataFrame, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val k = centroids.length
    val pairs = array((0 until k).map(i =>
      struct(element_at(col("d"), i + 1).as("d"), lit(i).as("c"))): _*)
    withDists(emb, centroids)
      .select(col("vec_id"), col("embedding"),
        slice(transform(array_sort(pairs), p => p.getField("c")), 1, nprobe).as("cells"))
  }
}
