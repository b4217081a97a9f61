package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.ext.{Dedup, PipelineOps, Similarity}

/** Ops probe for the candidate-volume guard (SURVEY.md §2.9 graceful
  * degradation): runs every guarded pair generator at each given corpus
  * dir with the ceiling forced to 1, so every run aborts in the guard
  * and PRINTS the exact accounted candidate volume plus the hottest
  * buckets — the numbers that size
  * [[Dedup.DefaultMaxCandidatePairs]]'s headroom at each scale, and the
  * first thing to run against a corpus suspected of degenerate
  * duplication density. Also prints the free tier-1 bounds (Σ df² and
  * the budgeted hottest-first bound) for the winnow and containment
  * guards: whether a corpus skips the exact tier-2 accounting at the
  * default cap is decided by THESE numbers — same helpers as the guards
  * themselves (shared formula + shared winnow defaults), so the
  * printout cannot diverge from what the operators compute.
  * usage: DedupGuardProbe <sfDir...> */
object DedupGuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
    args.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val wdf = Dedup.winnowDocFreq(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(f"[guardprobe] $dir winnow tier-1 bound (sum df(df-1)) = " +
        f"${Dedup.tier1Bound(wdf)}%.0f")
      println(f"[guardprobe] $dir winnow tier-1b budgeted bound = " +
        f"${Dedup.winnowBudgetedBound(docs, wdf, 0.7)}%.0f")
      wdf.unpersist()
      val cIdx = PipelineOps.buildContainmentIndex(docs)
      println(f"[guardprobe] $dir containment tier-1 budgeted bound = " +
        f"${PipelineOps.containmentBudgetedBound(cIdx, 0.8)}%.0f")
      cIdx.release()
      val vecs = docs.select(col("doc_id"),
        graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
      for ((op, run) <- Seq[(String, () => Unit)](
        "winnowNearDup" -> (() => Dedup.winnowNearDup(docs, 0.7).count(): Unit),
        "minhashNearDup" -> (() => Dedup.minhashNearDup(docs, 0.7).count(): Unit),
        "srpNearDup" -> (() =>
          Similarity.srpNearDup(vecs, 0.6, 128).count(): Unit),
        "srpSearchAgainst" -> (() => {
          // the on-ingest probe path (q_stream_semdedup): build the
          // even-id index UNGUARDED (builds generate no pairs), then
          // probe with the odd half under the cap
          val path = java.nio.file.Files
            .createTempDirectory("guardprobe_srpidx").toString
          try {
            spark.conf.unset(Dedup.MaxCandidatePairsConf)
            val idx = graft.ext.SrpIndex.build(
              vecs.where(col("doc_id") % 2 === 0), path, dim = 128)
            spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
            graft.ext.SrpIndex.searchAgainst(
              idx, vecs.where(col("doc_id") % 2 === 1), 0.6).count()
            ()
          } finally {
            spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
            org.apache.commons.io.FileUtils
              .deleteDirectory(new java.io.File(path))
          }
        }),
        "containmentPairs" -> (() =>
          PipelineOps.containmentPairs(docs, 0.8).count(): Unit))) {
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
