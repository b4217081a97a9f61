package graft.tools

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pair-exactness check for the auto-scaled SRP-LSH parameters: compares
  * [[Similarity.srpNearDup]] against the brute-force all-pairs cosine
  * ground truth on the feature-hashed document vectors. The driver's
  * oracle proves recall 1 at sf0.01 (bits auto-resolve to 8 there); this
  * tool proves it at the sfDirs passed on the command line, where the
  * auto-scaling picks larger (bits, bands). Brute force is O(n^2 d) —
  * use up to sf0.1; for the x10 corpus rely on the ~10x pair-count
  * invariant (ScaleData preserves intra-replica near-dup structure and
  * makes cross-replica shingles disjoint).
  * usage: SrpCheck <sfDir...> */
object SrpCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")
      val vecs = docs.select(col("doc_id"),
        graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
        .repartition(32)
        .persist()
      val lsh = Similarity.srpNearDup(vecs, threshold = 0.6, dim = 128)
        .select("doc_a", "doc_b").persist()
      val nLsh = lsh.count()
      if (sys.env.contains("SRP_COUNT_ONLY")) {
        println(s"[srpcheck] $dir: lsh=$nLsh (count only)")
        vecs.unpersist(); lsh.unpersist()
      } else {
      val withNorm = vecs
        .withColumn("nrm", sqrt(graft.functions.VectorExpressions.dot(
          spark, col("v"), col("v"))))
        .where(col("nrm") > 0)
      val a = withNorm.select(col("doc_id").as("doc_a"), col("v").as("va"),
        col("nrm").as("na"))
      val b = withNorm.select(col("doc_id").as("doc_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      // ONE brute-force pass carries the cosine, so both the pair-set
      // diff and the miss report read it (the cross join dominates the
      // tool's cost — computing it twice doubled wall-clock at sf0.1)
      val exactCos = a.crossJoin(b).where(col("doc_a") < col("doc_b"))
        .withColumn("cos", graft.functions.VectorExpressions.dot(
          spark, col("va"), col("vb")) / (col("na") * col("nb")))
        .where(col("cos") >= 0.6)
        .select("doc_a", "doc_b", "cos")
        .persist()
      val exact = exactCos.select("doc_a", "doc_b")
      val missed = exact.exceptAll(lsh).count()
      val extra = lsh.exceptAll(exact).count()
      println(s"[srpcheck] $dir: lsh=$nLsh missed=$missed extra=$extra " +
        (if (missed == 0 && extra == 0) "OK" else "MISMATCH"))
      if (missed > 0) {
        // report each miss with its cosine: a miss AT the threshold
        // boundary is the documented probabilistic band-recall regime
        // (see srpNearDup's scaladoc and tools/SrpMissDiag, which also
        // splits band-recall misses from hamming-gate drops); a miss
        // well above it would be a real defect.
        exactCos.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
          .orderBy(desc("cos")).limit(20).collect()
          .foreach(r => println(f"[srpcheck]   missed (${r.getLong(0)}%d, " +
            f"${r.getLong(1)}%d) cos=${r.getDouble(2)}%.6f"))
      }
      vecs.unpersist(); lsh.unpersist(); exactCos.unpersist()
      }
    }
    spark.stop()
  }
}
