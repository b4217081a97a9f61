package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The release-handle contract: operators that persist an internal
  * intermediate (globalRank's (doc_id, score) projection, cdcChunkDedup's
  * chunk rows) expose a `*Releasable` form whose `release()` drops the
  * blocks deterministically — a library caller outside Verify/Bench (which
  * lean on `clearCache()`) must be able to run these in a long-lived
  * session without accumulating MEMORY_AND_DISK blocks.
  *
  * Leak checks compare persistent-RDD id SETS (new ids only), not counts:
  * the shared test session's ContextCleaner may drop other suites' blocks
  * concurrently. */
class ReleasableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.collect {
      case (id, rdd) if rdd.getStorageLevel != StorageLevel.NONE => id
    }.toSet

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "entirely different content with no repeated chunks at all here"),
    (4L, "yet another unrelated document body for chunk hashing tests")
  ).toDF("doc_id", "text")

  test("globalRankReleasable: release() drops the internal persist") {
    val scores = Seq.tabulate(200)(i => (i.toLong, (i * 37 % 91).toLong))
      .toDF("doc_id", "score")
    val before = persistedIds
    val ranked = ext.MixOps.globalRankReleasable(scores)
    val rows = ranked.df.orderBy("rnk").collect()
    assert((persistedIds -- before).nonEmpty,
      "the decomposition should persist its (doc_id, score) projection")
    // dense 1..n ranking, descending score, doc_id as the tiebreak
    // (globalRank itself is a pure delegation to this .df, so content
    // assertions here cover both forms)
    assert(rows.map(_.getLong(2)).toSeq == (1L to 200L))
    ranked.release()
    assert((persistedIds -- before).isEmpty,
      "release() must unpersist the internal projection")
  }

  test("cdcChunkDedupReleasable: release() drops the chunk rows") {
    val before = persistedIds
    val res = ext.PipelineOps.cdcChunkDedupReleasable(docs)
    val got = res.df.orderBy("doc_id").collect()
    assert((persistedIds -- before).nonEmpty,
      "cdcChunkDedup should persist its chunk rows across the df-join")
    // docs 1 and 2 are identical → every chunk is cross-document
    // duplicated (cdcChunkDedup is a pure delegation to this .df, so
    // content assertions here cover both forms)
    val dup = got.filter(r => r.getLong(0) <= 2L)
    assert(dup.nonEmpty && dup.forall(r =>
      r.getAs[Long]("n_dup_chunks") == r.getAs[Long]("n_chunks")))
    res.release()
    assert((persistedIds -- before).isEmpty,
      "release() must unpersist the chunk rows")
  }

  test("trainedClassifier leaves no persisted blocks behind") {
    val corpus = Seq.tabulate(64) { i =>
      val good = "a clean well formed sentence with common words " * 3
      val bad = "zzqx jjkw vvbn " * 6
      (i.toLong, if (i % 3 == 0) bad else good)
    }.toDF("doc_id", "text")
    val before = persistedIds
    ext.TextOps.trainedClassifier(corpus).count()
    assert((persistedIds -- before).isEmpty,
      "trainedClassifier releases its rank projection after the threshold collect")
  }
}
