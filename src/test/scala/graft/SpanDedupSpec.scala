package graft

import graft.ext.SpanDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact substring-span dedup ([[graft.ext.SpanDedup]]): hand-checkable
  * span extraction, removal fingerprints, and hashed-vs-string gram-key
  * parity. */
class SpanDedupSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ten shared tokens >> w=4 so the repeat is visible to the window test;
  // doc 3 is unrelated filler with no 4-gram repeated anywhere.
  private val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("duplicated spans: cross-doc repeat found, boundaries maximal") {
    val d = docs(
      (1L, s"unique one two three $shared tail1 only"),
      (2L, s"other prefix words here $shared different suffix"),
      (3L, "totally unrelated filler text with no repeats at all"))
    val spans = SpanDedup.duplicateSpans(d, w = 4)
      .orderBy("doc_id").collect()
    // doc1 tokens: unique one two three alpha(4)..kappa(13) tail1 only
    // doc2 tokens: other prefix words here alpha(4)..kappa(13) different suffix
    // duplicated 4-grams are exactly the 7 windows inside the shared run,
    // positions 4..10; island end = 10 + 3 = 13.
    assert(spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 4, 13), (2L, 4, 13)))
  }

  test("self-repeat within one document is a duplicate too") {
    val d = docs(
      (1L, "aa bb cc dd xx yy aa bb cc dd"),
      (2L, "nothing shared with the first document at all"))
    val spans = SpanDedup.duplicateSpans(d, w = 4).collect()
    // "aa bb cc dd" occurs at pos 0 and pos 6 of doc 1: two islands
    // (gap 6 > w), each exactly the 4-gram itself.
    assert(spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ===
      Set((1L, 0, 3), (1L, 6, 9)))
  }

  test("spanDedup: stats and clean fingerprint pin the removal") {
    val d = docs(
      (1L, s"unique one two three $shared tail1 only"),
      (2L, s"other prefix words here $shared different suffix"),
      (3L, "totally unrelated filler text with no repeats at all"))
    val out = SpanDedup.spanDedup(d, w = 4)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    val r1 = out(0)
    assert(r1.getLong(1) === 16L) // total tokens
    assert(r1.getLong(2) === 1L) // one span
    assert(r1.getLong(3) === 10L) // the 10 shared tokens removed
    // clean text of doc1 = tokens outside [4,13]
    val expected1 = org.apache.commons.codec.digest.DigestUtils
      .md5Hex("unique one two three tail1 only")
    assert(r1.getString(4) === expected1)
    val r3 = out(2)
    assert(r3.getLong(2) === 0L)
    assert(r3.getLong(3) === 0L)
    assert(r3.getString(4) === org.apache.commons.codec.digest.DigestUtils
      .md5Hex("totally unrelated filler text with no repeats at all"))
  }

  test("spanDedupAgainst: corpus grams mark arrivals; intra-batch " +
      "repeats deliberately do not") {
    val corpus = docs((100L, s"corpus doc holds $shared inside it"))
    val index = SpanDedup.buildGramIndex(corpus, w = 4)
    // doc 1 repeats the corpus run; docs 2+3 share a run found NOWHERE
    // in the corpus — vs-corpus scoring must ignore it (batching
    // invariance demands the static set only)
    val batch = docs(
      (1L, s"arrival with $shared and a tail"),
      (2L, "pqr stu vwx yz1 234 alone here"),
      (3L, "pqr stu vwx yz1 234 again now"))
    val out = SpanDedup.spanDedupAgainst(index, batch)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 1L) // doc 1: one span (the shared run)
    assert(out(0).getLong(3) === 10L)
    assert(out(1).getLong(2) === 0L) // docs 2-3: no corpus-backed span
    assert(out(2).getLong(2) === 0L)
    // batching invariance: one batch == two batches, per doc
    val oneByOne = batch.collect().map(_.getLong(0)).sorted.flatMap { id =>
      SpanDedup.spanDedupAgainst(index, batch.where(col("doc_id") === id))
        .collect()
    }
    assert(out.map(_.toString).toSeq === oneByOne.map(_.toString).toSeq)
    index.release()
  }

  test("gram index save/load/append: loaded probe == in-memory probe; " +
      "append == rebuild over the union") {
    val corpus = docs((100L, s"corpus doc holds $shared inside it"))
    val built = SpanDedup.buildGramIndex(corpus, w = 4)
    val path = java.nio.file.Files.createTempDirectory("gramidx").toString
    SpanDedup.saveGramIndex(built, path)
    val loaded = SpanDedup.loadGramIndex(spark, path)
    assert(loaded.w === 4 && loaded.hashGrams)
    val batch = docs(
      (1L, s"arrival with $shared and a tail"),
      (2L, "pqr stu vwx yz1 234 alone here"))
    val viaLoaded = SpanDedup.spanDedupAgainst(loaded, batch)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val viaBuilt = SpanDedup.spanDedupAgainst(built, batch)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(viaLoaded === viaBuilt)
    // grow the index with doc 2's grams: doc 3 repeating doc 2's run now
    // scores a span, and the grown index == a fresh build over the union
    SpanDedup.appendToGramIndex(path, batch.where(col("doc_id") === 2))
    val grown = SpanDedup.loadGramIndex(spark, path)
    val probe = docs((3L, "pqr stu vwx yz1 234 again now"))
    val viaGrown = SpanDedup.spanDedupAgainst(grown, probe)
      .collect().map(_.toString).toSeq
    val rebuilt = SpanDedup.buildGramIndex(
      corpus.union(batch.where(col("doc_id") === 2)), w = 4)
    val viaRebuilt = SpanDedup.spanDedupAgainst(rebuilt, probe)
      .collect().map(_.toString).toSeq
    assert(viaGrown === viaRebuilt)
    assert(viaGrown.head.contains("1,")) // doc 3: one corpus-backed span
    built.release(); rebuilt.release()
  }

  test("SpanRemove kernel: merge walk == per-position exists() reference " +
      "on edge cases (empty, all covered, adjacent, past-end spans)") {
    import spark.implicits._
    val rows = Seq(
      (Seq.empty[String], Seq.empty[(Int, Int)]),
      (Seq("a"), Seq((0, 0))),
      (Seq("a"), Seq.empty[(Int, Int)]),
      ("a b c d e f".split(" ").toSeq, Seq((0, 1), (3, 4))),
      ("a b c d e f".split(" ").toSeq, Seq((0, 5))),
      // span_end = max pos + (w-1) can point past the last token
      ("a b c d e f".split(" ").toSeq, Seq((4, 9))),
      ("a b c d e f g h".split(" ").toSeq, Seq((1, 2), (4, 4), (6, 7))))
    val df = rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("id", "toks", "sp0")
      .withColumn("sp",
        expr("transform(sp0, x -> struct(x._1 as s, x._2 as e))"))
    val out = df.select(col("id"),
      graft.functions.SpanRemove(spark, col("toks"), col("sp")).as("got"),
      expr("""CASE WHEN size(toks) = 0 THEN '' ELSE array_join(
        transform(
          filter(sequence(0, size(toks) - 1),
            i -> NOT exists(sp, x -> i >= x.s AND i <= x.e)),
          i -> element_at(toks, i + 1)), ' ') END""").as("want"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"case ${r.getLong(0)}")
    }
  }

  test("hashed gram keys agree with exact string keys on real data") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hashed = SpanDedup.spanDedup(d, w = 8, hashGrams = true)
    val exact = SpanDedup.spanDedup(d, w = 8, hashGrams = false)
    assert(hashed.exceptAll(exact).isEmpty && exact.exceptAll(hashed).isEmpty)
    // and the operator actually fires on the synthetic corpus
    assert(SpanDedup.duplicateSpans(d, w = 8).count() > 0)
  }
}
