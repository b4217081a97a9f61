package graft

import graft.ext.{Dedup, Multimodal}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the Spark-only extension operators (no DuckDB oracle):
  * SimHash near-dup behavior and the multimodal feature-extraction plumbing. */
class ExtOpsSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("simhash: near-dup documents land within small hamming distance, random pairs far") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sims = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    val nearDupPairs = Dedup.jaccardNearDup(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDupPairs.nonEmpty)
    val nearDists = nearDupPairs.map { case (a, b) => hamming(sims(a), sims(b)) }
    assert(nearDists.forall(_ <= 12), s"near-dup hamming distances: ${nearDists.toSeq}")

    // random non-dup pairs should be near 32 bits apart on average
    val ids = sims.keys.toArray.sorted.take(40)
    val nearSet = nearDupPairs.toSet
    val randomDists = for {
      a <- ids; b <- ids
      if a < b && !nearSet.contains((a, b))
    } yield hamming(sims(a), sims(b))
    assert(randomDists.sum.toDouble / randomDists.length > 20.0)
  }

  test("simhash is deterministic and identical for identical text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    val m = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }

  test("multimodal extractFeatures: partition-parallel stub decode with stable output") {
    val media = Multimodal.documentsAsMedia(Tables.load(spark, sfDir, "documents"))
      .repartition(4)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === 500)
    assert(rows.forall(_.getSeq[Double](4).length === Multimodal.featureDim))
    // n_bytes matches the metadata byte length computed relationally
    val nb = feats.select("doc_id", "n_bytes")
    val exp = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("n_bytes"))
    assert(nb.except(exp).count() === 0)
    assert(exp.except(nb).count() === 0)
    // deterministic under re-execution
    val again = Multimodal.extractFeatures(media).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }
}
