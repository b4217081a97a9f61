package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Dedup, PipelineOps, Similarity}
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

  test("srpNearDup aborts with the (band, bval) bucket diagnostic — " +
      "covering semanticDedup, which pairs exclusively through it") {
    val docs = Tables.load(spark, sfDir, "documents")
    val vecs = docs.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
    val e = withCap(Some("7")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        Similarity.srpNearDup(vecs, 0.6, 128).count()
      }
    }
    assert(e.op === "srpNearDup")
    assert(e.totalPairs > 7L)
    assert(e.topBuckets.head._1.contains("/"),
      "srp buckets are named band/bval")
    assert(e.getMessage.contains(Dedup.MaxCandidatePairsConf))
  }

  test("containmentPairs (self-join) aborts with the hot shingles named") {
    val docs = Tables.load(spark, sfDir, "documents")
    val e = withCap(Some("3")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        PipelineOps.containmentPairs(docs, 0.8).count()
      }
    }
    assert(e.op === "containmentPairs")
    assert(e.totalPairs > 3L)
    assert(e.topBuckets.nonEmpty && e.topBuckets.forall(_._2 > 0))
    assert(e.getMessage.contains(e.topBuckets.head._1))
  }

  test("containmentAgainst (probe path) accounts np·df exactly and aborts") {
    val docs = Tables.load(spark, sfDir, "documents")
    val idx = PipelineOps.buildContainmentIndex(docs)
    try {
      val e = withCap(Some("3")) {
        intercept[Dedup.CandidateVolumeExceeded] {
          PipelineOps.containmentAgainst(idx, docs, 0.8).count()
        }
      }
      assert(e.op === "containmentPairs")
      // probing the corpus against its own index counts the full df
      // fan-out (no self-exclusion: an arrival is not in the index), so
      // the probe volume strictly exceeds the self-join's np·(df-1)
      val selfVol = withCap(Some("3")) {
        intercept[Dedup.CandidateVolumeExceeded] {
          PipelineOps.containmentPairs(docs, 0.8).count()
        }.totalPairs
      }
      assert(e.totalPairs > selfVol)
    } finally idx.release()
  }

  test("the free bounds dominate in order: tier-1 >= budgeted >= exact " +
      "(winnow), and budgeted >= exact (containment)") {
    val docs = Tables.load(spark, sfDir, "documents")
    val wdf = Dedup.winnowDocFreq(docs)
    val t1 = Dedup.tier1Bound(wdf)
    val t1b = Dedup.winnowBudgetedBound(docs, wdf, 0.7)
    val exact = withCap(Some("1")) {
      intercept[Dedup.CandidateVolumeExceeded] {
        Dedup.winnowNearDup(docs, 0.7).count()
      }.totalPairs
    }
    assert(t1 >= t1b, s"tier-1 $t1 must dominate the budgeted bound $t1b")
    assert(t1b >= exact.toDouble,
      s"budgeted bound $t1b must dominate the exact volume $exact")
    val idx = PipelineOps.buildContainmentIndex(docs)
    try {
      val cb = PipelineOps.containmentBudgetedBound(idx, 0.8)
      val cExact = withCap(Some("1")) {
        intercept[Dedup.CandidateVolumeExceeded] {
          PipelineOps.containmentPairs(docs, 0.8).count()
        }.totalPairs
      }
      assert(cb >= cExact.toDouble,
        s"containment budgeted bound $cb must dominate exact $cExact")
    } finally idx.release()
  }

  test("a malformed ceiling conf fails naming the key, not with a bare " +
      "NumberFormatException") {
    val docs = Tables.load(spark, sfDir, "documents")
    val e = withCap(Some("lots")) {
      intercept[IllegalArgumentException] {
        Dedup.winnowNearDup(docs, 0.7).count()
      }
    }
    assert(e.getMessage.contains(Dedup.MaxCandidatePairsConf))
    assert(e.getMessage.contains("lots"))
  }

  test("srp and containment fall through unchanged at the default ceiling") {
    val docs = Tables.load(spark, sfDir, "documents")
    val vecs = docs.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
    val srpDefault = withCap(None) {
      Similarity.srpNearDup(vecs, 0.6, 128).collect().map(_.toSeq).toSet
    }
    val srpDisabled = withCap(Some("0")) {
      Similarity.srpNearDup(vecs, 0.6, 128).collect().map(_.toSeq).toSet
    }
    assert(srpDefault === srpDisabled)
    assert(srpDefault.nonEmpty)
    val cDefault = withCap(None) {
      PipelineOps.containmentPairs(docs, 0.8).collect().map(_.toSeq).toSet
    }
    val cDisabled = withCap(Some("0")) {
      PipelineOps.containmentPairs(docs, 0.8).collect().map(_.toSeq).toSet
    }
    assert(cDefault === cDisabled)
    assert(cDefault.nonEmpty)
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
    // soundness invariant the tiered split rests on: bound >= exact;
    // the cap must sit below BOTH free bounds or the guard (correctly)
    // skips tier 2 and the false-trip path is never exercised
    val wdf = Dedup.winnowDocFreq(docs)
    val bound = math.min(
      Dedup.tier1Bound(wdf), Dedup.winnowBudgetedBound(docs, wdf, 0.7))
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
