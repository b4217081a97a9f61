package graft

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winnowing fingerprints (graft.functions.Winnow) and the fingerprint
  * near-dup operator: the MOSS shared-run guarantee, md5/SQL parity of the
  * portable hash, rolling-variant agreement, and the df cap. */
class WinnowSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def fps(text: String, rolling: Boolean): Set[Long] = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
      .select(graft.functions.Winnow(spark, col("text"), 8, 4, rolling).as("f"))
      .collect().head.getSeq[Long](0).toSet
  }

  test("winnowing guarantee: documents sharing a long run share a fingerprint (both hashes)") {
    // any shared normalized substring of length >= k + w - 1 = 11 must
    // yield a common selected fingerprint — the core MOSS property
    val shared = "the common stolen paragraph lives here unchanged"
    val a = s"totally unrelated preamble alpha beta. $shared and then more."
    val b = s"$shared. a different suffix with other words entirely gamma."
    for (rolling <- Seq(false, true)) {
      val ia = fps(a, rolling); val ib = fps(b, rolling)
      assert((ia & ib).nonEmpty, s"rolling=$rolling: no shared fingerprint")
    }
    // disjoint documents share nothing
    val c = fps("zq vx wk jm pn bd fg hr lt cy " * 3, rolling = false)
    assert((fps(a, rolling = false) & c).isEmpty)
  }

  test("portable fingerprints match the oracle's hex-string formulation") {
    import java.security.MessageDigest
    val text = "The quick brown fox jumps over the lazy dog, twice over."
    val norm = "[a-z0-9]+".r.findAllIn(text.toLowerCase).mkString
    val grams = (0 to norm.length - 8).map(i => norm.substring(i, i + 8))
    val hs = grams.map { g =>
      val hex = MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val expected = (0 to hs.length - 4).map(j => hs.slice(j, j + 4).min).toSet
    assert(fps(text, rolling = false) === expected)
  }

  test("winnowNearDup finds the known pairs; rolling agrees; prefix filter lossless") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val docs = Tables.load(spark, dir, "documents")
      val got = Dedup.winnowNearDup(docs, 0.7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.nonEmpty, s"$dir: expected near-dup pairs")
      val rolling = Dedup.winnowNearDup(docs, 0.7, rolling = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rolling === got.map(p => (p._1, p._2)), s"$dir: hash variants disagree")
      // losslessness: the rarest-first prefix filter must return exactly
      // the direct all-pairs fingerprint self-join's rows (pairs AND
      // overlap values — the pigeonhole bound verified end-to-end)
      val fp = docs.select(col("doc_id"),
        explode(graft.functions.Winnow(spark, col("text"), 8, 4,
          rolling = false)).as("fp"))
      val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val direct = fp.select(col("doc_id").as("doc_a"), col("fp"))
        .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
        .join(nf.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(nf.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(col("c").cast("double") / least(col("na"), col("nb")), 6)
            .as("overlap"))
        .where(col("overlap") >= 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === direct, s"$dir: prefix filter diverged from all-pairs")
    }
  }

  test("rolling candidate path: volume guard trips on a degenerate " +
      "corpus, completes it with the guard off (r19 ADVICE)") {
    // winnowRecallGate no longer re-runs the rolling operator, so the
    // rolling leg's candidate join + guard need their own end-to-end
    // fixture: mass-identical docs collapse every fingerprint bucket
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, "the same exact sentence repeated for winnowing " * 4))
      .toDF("doc_id", "text")
    spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
    try {
      val e = intercept[Dedup.CandidateVolumeExceeded](
        Dedup.winnowNearDup(docs, 0.7, rolling = true).count())
      assert(e.getMessage.contains("winnowNearDup"))
    } finally spark.conf.unset(Dedup.MaxCandidatePairsConf)
    // guard off: the degenerate corpus completes and every pair surfaces
    assert(Dedup.winnowNearDup(docs, 0.7, rolling = true).count()
      === 40L * 39 / 2)
  }

  test("winnowRecallGate emits portable pairs with recall_ok true") {
    val docs = Tables.load(spark, sfDir, "documents")
    val expected = Dedup.winnowNearDup(docs, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gate = Dedup.winnowRecallGate(docs).collect()
    assert(gate.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    assert(gate.forall(_.getBoolean(2)))
  }
}
