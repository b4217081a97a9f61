package graft.tools

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** True-recall check for MinHash-LSH banding (the [[tools.SrpCheck]]
  * analog for Jaccard): compares [[Dedup.minhashNearDup]]'s pair set
  * against the EXACT shingle-inverted-index ground truth
  * ([[Dedup.jaccardNearDup]] — O(pairs sharing a shingle), feasible at
  * every provisioned scale) at the production banding (3 bands x 3 rows,
  * threshold 0.7).
  *
  * Note the registry oracle (q_minhash_lsh) deliberately REPLAYS the
  * banding in SQL, so the driver's hash gate proves determinism of the
  * LSH path, not recall — this tool supplies the missing recall
  * measurement. A pair at Jaccard j collides per band with probability
  * ~ j^rowsPerBand, so misses concentrate AT the threshold boundary
  * (j=0.7: 1-(1-0.343)^3 = 72% per-pair recall; j=0.9: 97.9%); like
  * SRP, the corpus's true dup mode sits at j ~ 1 where recall is ~1.
  * Misses are printed with their exact Jaccard so a boundary miss is
  * distinguishable from a defect.
  * usage: MinhashCheck [-b bands] [-r rowsPerBand] <sfDir...>
  * (override the banding to measure a margin-sized configuration, e.g.
  * -b 16 -r 4 centers the S-curve at (1/16)^(1/4) = 0.5 for recall
  * ~0.99 at j >= 0.7) */
object MinhashCheck {
  def main(rawArgs: Array[String]): Unit = {
    def usage(): Nothing = {
      System.err.println(
        "usage: MinhashCheck [-b bands] [-r rowsPerBand] <sfDir...>")
      sys.exit(2)
    }
    // toIntOption (not isDigit+toInt): rejects overflow ("99999999999")
    // and non-ASCII Unicode digits with usage() instead of a crash
    def intArg(i: Int): Int =
      if (i < rawArgs.length) rawArgs(i).toIntOption.filter(_ >= 1)
        .getOrElse(usage())
      else usage()
    var bands = 3; var rows = 3
    val args = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < rawArgs.length) {
      rawArgs(i) match {
        case "-b" => bands = intArg(i + 1); i += 2
        case "-r" => rows = intArg(i + 1); i += 2
        case a => args += a; i += 1
      }
    }
    if (args.isEmpty) usage()
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
      val lsh = Dedup.minhashNearDup(docs, 0.7, bands = bands, rowsPerBand = rows)
        .select("doc_a", "doc_b").persist()
      val nLsh = lsh.count()
      val exact = Dedup.jaccardNearDup(docs, 0.7)
        .select(col("doc_a"), col("doc_b"), col("jaccard")).persist()
      val nExact = exact.count()
      val missedRows = exact.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
        .orderBy(desc("jaccard")).collect()
      val extra = lsh.join(exact.select("doc_a", "doc_b"),
        Seq("doc_a", "doc_b"), "left_anti").count()
      println(s"[minhashcheck] $dir (b=$bands r=$rows): lsh=$nLsh exact=$nExact " +
        s"missed=${missedRows.length} extra=$extra " +
        (if (missedRows.isEmpty && extra == 0) "OK" else "MISMATCH"))
      missedRows.take(20).foreach(r =>
        println(f"[minhashcheck]   missed (${r.getLong(0)}%d, ${r.getLong(1)}%d) " +
          f"jaccard=${r.getDouble(2)}%.4f"))
      lsh.unpersist(); exact.unpersist()
    }
    spark.stop()
  }
}
