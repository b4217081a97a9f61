package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup

/** Ops probe for the candidate-volume guard (SURVEY.md §2.9 graceful
  * degradation): runs the winnow and minhash pair generators at each
  * given corpus dir with the ceiling forced to 1, so every run aborts in
  * the guard and PRINTS the exact accounted candidate volume plus the
  * hottest buckets — the numbers that size
  * [[Dedup.DefaultMaxCandidatePairs]]'s headroom at each scale, and the
  * first thing to run against a corpus suspected of degenerate
  * duplication density. usage: DedupGuardProbe <sfDir...> */
object DedupGuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
    args.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      // tier-1 bound for the winnow guard (Σ df² >= Σ np·df): whether a
      // corpus pays the exact tier-2 accounting at the default cap is
      // decided by THIS number — print it per corpus. Same helpers as
      // the guard itself (shared formula + shared winnow defaults), so
      // this printout cannot diverge from what winnowNearDup computes.
      val bound = Dedup.tier1Bound(Dedup.winnowDocFreq(docs))
      println(f"[guardprobe] $dir winnow tier-1 bound (sum df^2) = $bound%.0f")
      for ((op, run) <- Seq[(String, () => Unit)](
        "winnowNearDup" -> (() => Dedup.winnowNearDup(docs, 0.7).count(): Unit),
        "minhashNearDup" -> (() => Dedup.minhashNearDup(docs, 0.7).count(): Unit))) {
        try {
          run()
          println(s"[guardprobe] $dir $op: UNEXPECTED completion at cap=1")
        } catch {
          case e: Dedup.CandidateVolumeExceeded =>
            println(s"[guardprobe] $dir $op: accounted=${e.totalPairs} " +
              s"top=${e.topBuckets.map { case (k, v) => s"$k:$v" }.mkString(",")}")
        }
      }
    }
    spark.stop()
  }
}
