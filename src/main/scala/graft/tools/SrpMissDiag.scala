package graft.tools

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose a SrpCheck MISMATCH: for each true pair (cosine >= threshold)
  * the LSH path missed, print its exact cosine, its signature hamming
  * distance vs the prefilter gate, and how many of the (bits, bands)
  * bands collided — separating a borderline band-recall miss (no band
  * collision; probabilistic, expected at the threshold boundary) from a
  * hamming-gate drop (band collision but popcount above the gate; would
  * violate the 6-sigma margin claim).
  * usage: SrpMissDiag <sfDir> */
object SrpMissDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val threshold = 0.6
    val docs = Tables.load(spark, dir, "documents")
    val vecs = docs.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
      .repartition(32).persist()

    val lsh = Similarity.srpNearDup(vecs, threshold, dim = 128)
      .select("doc_a", "doc_b").persist()

    val withNorm = vecs
      .withColumn("nrm", sqrt(graft.functions.VectorExpressions.dot(
        spark, col("v"), col("v"))))
      .where(col("nrm") > 0)
    val a = withNorm.select(col("doc_id").as("doc_a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = withNorm.select(col("doc_id").as("doc_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val exact = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
      .withColumn("cos", graft.functions.VectorExpressions.dot(
        spark, col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select("doc_a", "doc_b", "cos")
    val missed = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
      .collect()
    println(s"[srpmiss] $dir: ${missed.length} missed pair(s)")

    // recompute signatures from srpNearDup's OWN sizing helpers (same
    // formulas, seed, and hyperplane family — no hand-copied constants to
    // desynchronize if the sizing is tuned)
    val n = withNorm.count()
    val nBits = Similarity.srpAutoBits(n)
    val nBands = Similarity.srpAutoBands(nBits)
    val h = nBits * nBands
    val hamMax = Similarity.srpHamMax(h, threshold)
    println(s"[srpmiss] n=$n bits=$nBits bands=$nBands h=$h hamMax=$hamMax " +
      f"(expected hamming at cos=t: ${h * math.acos(threshold) / math.Pi}%.1f)")
    val flat = Similarity.srpHyperplanes(h, 128)
    val proj = graft.functions.VectorExpressions.matVecConst(
      spark, flat, col("v"), h)
    val sigs = vecs.select(col("doc_id"), col("v"))
      .withColumn("__proj", proj)
      .select(col("doc_id"),
        graft.functions.VectorExpressions.signBands(
          spark, col("__proj"), nBits, nBands).as("bb"),
        graft.functions.VectorExpressions.packSigns(
          spark, col("__proj")).as("sig"))
      .persist()
    missed.foreach { row =>
      val (da, db, cos) = (row.getLong(0), row.getLong(1), row.getDouble(2))
      val sa = sigs.where(col("doc_id") === da)
        .select("bb", "sig").collect()(0)
      val sb = sigs.where(col("doc_id") === db)
        .select("bb", "sig").collect()(0)
      def longs(r: org.apache.spark.sql.Row, i: Int): Seq[Long] =
        r.getSeq[Any](i).map { case x: Number => x.longValue() }
      val ba = longs(sa, 0); val bbv = longs(sb, 0)
      val shared = ba.zip(bbv).count { case (x, y) => x == y }
      val pa = longs(sa, 1); val pb = longs(sb, 1)
      val ham = pa.zip(pb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      println(f"[srpmiss] pair ($da%d, $db%d) cos=$cos%.6f " +
        s"sharedBands=$shared/$nBands hamming=$ham (gate $hamMax) -> " +
        (if (shared == 0) "BAND-RECALL miss (no collision)"
         else if (ham > hamMax) "HAMMING-GATE drop"
         else "verify-stage loss?!"))
    }
    spark.stop()
  }
}
