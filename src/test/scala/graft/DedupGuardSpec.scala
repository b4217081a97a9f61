package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.sources.Tables

/** Pins the candidate-volume guard (graceful degradation for
  * output-bound dedup): with the ceiling forced low, the pair-generating
  * operators must abort BEFORE their candidate shuffle with an error
  * naming the operator, the accounted volume, the ceiling and the
  * hottest buckets — and must run to an unchanged result when the
  * ceiling is at its default (real corpora sit far under it) or
  * disabled. */
class DedupGuardSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withCap[T](cap: Option[String])(body: => T): T = {
    cap match {
      case Some(v) => spark.conf.set(Dedup.MaxCandidatePairsConf, v)
      case None => spark.conf.unset(Dedup.MaxCandidatePairsConf)
    }
    try body finally spark.conf.unset(Dedup.MaxCandidatePairsConf)
  }

  test("winnowNearDup aborts with the bucket diagnostic when the ceiling " +
      "is exceeded") {
    val docs = Tables.load(spark, sfDir, "documents")
    val e = withCap(Some("10")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        Dedup.winnowNearDup(docs, 0.7).count()
      }
    }
    assert(e.op === "winnowNearDup")
    assert(e.cap === 10L)
    assert(e.totalPairs > 10L)
    assert(e.topBuckets.nonEmpty && e.topBuckets.forall(_._2 > 0))
    // the diagnostic is actionable: conf key to raise, hottest bucket named
    assert(e.getMessage.contains(Dedup.MaxCandidatePairsConf))
    assert(e.getMessage.contains(e.topBuckets.head._1))
  }

  test("minhashNearDup aborts with the (band, bkey) bucket diagnostic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val e = withCap(Some("5")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        Dedup.minhashNearDup(docs, 0.7).count()
      }
    }
    assert(e.op === "minhashNearDup")
    assert(e.totalPairs > 5L)
    assert(e.topBuckets.head._1.contains("/"),
      "minhash buckets are named band/bkey")
  }

  test("default and disabled ceilings leave results unchanged") {
    val docs = Tables.load(spark, sfDir, "documents")
    val underDefault = withCap(None) {
      Dedup.winnowNearDup(docs, 0.7).collect().map(_.toSeq).toSet
    }
    val disabled = withCap(Some("0")) {
      Dedup.winnowNearDup(docs, 0.7).collect().map(_.toSeq).toSet
    }
    assert(underDefault === disabled)
    assert(underDefault.nonEmpty)
  }

  test("a tripped tier-1 bound with a passing exact volume proceeds " +
      "with unchanged results (false-trip path)") {
    val docs = Tables.load(spark, sfDir, "documents")
    // soundness invariant the two-tier split rests on: bound >= exact
    val bound = Dedup.tier1Bound(Dedup.winnowDocFreq(docs))
    val exact = withCap(Some("1")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        Dedup.winnowNearDup(docs, 0.7).count()
      }.totalPairs
    }
    assert(bound >= exact.toDouble,
      s"tier-1 bound $bound must dominate the exact volume $exact")
    // a cap BETWEEN exact and bound trips tier 1 but passes tier 2:
    // the guard must fall through to the join, not abort on the bound.
    // (clamp before toLong: on a degenerate corpus the double bound
    // can exceed Long range, and an unclamped cast would overflow
    // midCap into nonsense instead of failing the precondition below)
    val boundL = math.min(bound, Long.MaxValue.toDouble).toLong
    val midCap = exact + ((boundL - exact) / 2).max(1L)
    assert(midCap > exact && midCap.toDouble < bound,
      s"corpus must separate exact=$exact from bound=$bound to pin this")
    val falseTrip = withCap(Some(midCap.toString)) {
      Dedup.winnowNearDup(docs, 0.7).collect().map(_.toSeq).toSet
    }
    val disabled = withCap(Some("0")) {
      Dedup.winnowNearDup(docs, 0.7).collect().map(_.toSeq).toSet
    }
    assert(falseTrip === disabled)
    assert(falseTrip.nonEmpty)
  }

}
