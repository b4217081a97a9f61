package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration for the q_simhash_fast self-validating gate: prints the
  * 64-bit SimHash hamming-distance distribution over the EXACT
  * Jaccard>=t near-dup pairs (the SQL-reproducible ground truth), for
  * both the xxhash64 scale variant and the md5-portable variant.
  * The gate's (maxHamming, floor) pair is chosen from these numbers
  * with margin; re-run after any shingle/hash change:
  *   runMain graft.tools.SimhashRecall /root/testdata/sf0.01 [t]
  */
object SimhashRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val t = if (args.length > 1) args(1).toDouble else 0.7
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val pairs = graft.ext.Dedup.jaccardNearDup(docs, t).select("doc_a", "doc_b")
    for ((label, sig) <- Seq(
        "xxhash64" -> graft.ext.Dedup.simhash(docs),
        "md5"      -> graft.ext.Dedup.simhashPortable(docs))) {
      val ham = pairs
        .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("sa")), "doc_a")
        .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("sb")), "doc_b")
        .select(expr("bit_count(sa ^ sb)").as("ham"))
        .groupBy("ham").count().orderBy("ham")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      val n = ham.map(_._2).sum
      println(s"[$label] $n pairs at jaccard>=$t, hamming distribution:")
      ham.foreach { case (h, c) => println(f"  ham=$h%2d  $c%5d") }
      var cum = 0L
      ham.foreach { case (h, c) =>
        cum += c
        println(f"  recall@ham<=$h%2d = ${cum.toDouble / n}%.3f")
      }
    }
    spark.stop()
  }
}
