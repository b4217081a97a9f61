package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** Pins the guard-bypassing `winnowNearDup(..., guarded = false)`
  * overload from INSIDE `graft.ext` — the overload is `private[ext]`
  * on purpose (it can launch an unaccounted candidate shuffle, the
  * failure mode the guard exists to prevent, so its caller surface
  * stays the one package whose callers can uphold the
  * already-accounted contract: today only [[Dedup.winnowRecallGate]]'s
  * rolling leg). */
class DedupUnguardedSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("the unguarded overload skips the ceiling entirely (recall-gate " +
      "rolling leg) and returns the guarded result") {
    val docs = Tables.load(spark, sfDir, "documents")
    spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
    try {
      // cap=1 aborts every guarded call on this corpus...
      intercept[Dedup.CandidateVolumeExceeded] {
        Dedup.winnowNearDup(docs, 0.7).count()
      }
      // ...but the unguarded overload must still run — it exists so
      // winnowRecallGate's rolling leg, whose volume the portable
      // leg's guard already accounted, does not pay the action twice
      val unguarded = Dedup.winnowNearDup(docs, 0.7, Dedup.DefaultWinnowK,
        Dedup.DefaultWinnowW, rolling = false, guarded = false)
        .collect().map(_.toSeq).toSet
      spark.conf.unset(Dedup.MaxCandidatePairsConf)
      val guarded = Dedup.winnowNearDup(docs, 0.7)
        .collect().map(_.toSeq).toSet
      assert(unguarded === guarded)
      assert(unguarded.nonEmpty)
    } finally spark.conf.unset(Dedup.MaxCandidatePairsConf)
  }
}
