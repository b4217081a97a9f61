package graft

import graft.ext.PipelineOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins content-defined chunking (PipelineOps.cdcChunkDedup): boundaries
  * move with content, so edits stay local — the property fixed-size
  * chunking lacks and the reason CDC exists.
  */
class CdcDedupSpec extends AnyFunSuite with SparkSpec {

  private def chunksOf(text: String): Seq[String] = {
    import spark.implicits._
    val one = Seq((1L, text)).toDF("doc_id", "text")
    // reuse the operator's cut/slice expressions by re-deriving chunks
    // through a two-doc corpus trick: a doc duplicated twice has every
    // chunk at df=2, so n_chunks is directly comparable; for the chunk
    // LIST itself, rebuild via the same SQL contract in Spark
    val t = lower(col("text"))
    val n = length(t)
    val hit = (x: org.apache.spark.sql.Column) =>
      conv(substring(md5(x), 1, 8), 16, 10).cast("long") % 64 === 0
    val cuts = when(n >= 8,
      filter(sequence(lit(1), n - 7), i => hit(t.substr(i, lit(8)))))
      .otherwise(array().cast("array<int>"))
    val nc = size(cuts)
    val chunks = filter(
      transform(sequence(lit(1), nc + 1), k => {
        val s = when(k === 1, lit(1)).otherwise(element_at(cuts, k - 1) + 8)
        val e = when(k === nc + 1, n).otherwise(element_at(cuts, k) + 7)
        t.substr(s, e - s + 1)
      }),
      ch => ch =!= lit(""))
    one.select(chunks.as("c")).collect()(0).getSeq[String](0)
  }

  test("chunks reassemble to the document and are content-defined") {
    val doc = "the quick brown fox jumps over the lazy dog " * 20
    val ch = chunksOf(doc)
    assert(ch.mkString("") === doc.toLowerCase)
    assert(ch.size > 1, "corpus-sized doc must cut at least once")
  }

  test("insertion robustness: an edit reshapes only its neighborhood") {
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val edited = base.substring(0, 10) + "INSERTED TEXT " + base.substring(10)
    val a = chunksOf(base)
    val b = chunksOf(edited)
    // every chunk after the edit's neighborhood keeps its identity: the
    // shared suffix of the chunk sequences must cover most of the doc
    val sharedSuffix = a.reverse.zip(b.reverse).takeWhile {
      case (x, y) => x == y
    }.map(_._1.length).sum
    assert(sharedSuffix >= base.length / 2,
      s"CDC lost downstream alignment: only $sharedSuffix of " +
        s"${base.length} chars realigned")
  }

  test("supplementary characters: positions are code points, " +
      "reassembly survives astral chars") {
    // U+1F600 is 2 UTF-16 units but 1 code point: a UTF-16 kernel walk
    // would shift every later cut and mis-slice chunks
    val doc = ("start 😀 middle " +
      "the quick brown fox jumps over the lazy dog " * 15) + "😀 end"
    val ch = chunksOf(doc)
    assert(ch.mkString("") === doc.toLowerCase)
    assert(ch.size > 1)
  }

  test("property: reassembly holds for random mixed-script strings") {
    val rng = new scala.util.Random(42)
    val alphabet =
      "abcdefghij 0123456789中文字符éüñ😀🎉" // ascii + BMP + astral
    val cps = alphabet.codePoints().toArray
    (1 to 10).foreach { _ =>
      val len = 50 + rng.nextInt(400)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach(_ => sb.appendCodePoint(cps(rng.nextInt(cps.length))))
      val doc = sb.toString
      assert(chunksOf(doc).mkString("") === doc.toLowerCase,
        s"reassembly failed for: $doc")
    }
  }

  test("cross-doc dup accounting on a controlled corpus") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog " * 10
    val docs = Seq(
      (1L, shared + "unique tail one xyzzy"),
      (2L, shared + "completely different ending plugh"),
      (3L, "entirely unrelated content with no overlap at all"))
      .toDF("doc_id", "text")
    val out = PipelineOps.cdcChunkDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 share the long prefix: most of their chunks are dups
    assert(out(1L)._2 > 0 && out(2L)._2 > 0)
    assert(out(3L)._2 === 0L, "unrelated doc must have no dup chunks")
  }

  test("against-form over the reference corpus reduces to the self-form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val self = PipelineOps.cdcChunkDedup(docs)
    val against = PipelineOps.cdcDedupAgainst(
      PipelineOps.cdcChunkDf(docs), docs)
    assert(self.exceptAll(against).count() === 0L)
    assert(against.exceptAll(self).count() === 0L)
  }

  test("real corpus: every doc chunked, reassembly holds on a sample") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PipelineOps.cdcChunkDedup(docs)
    assert(out.count() === docs.count(), "every non-empty doc must appear")
    val totalChunks = out.agg(sum("n_chunks")).collect()(0).getLong(0)
    assert(totalChunks > docs.count(), "chunking must cut documents")
    // reassembly invariant on a sample of real docs
    docs.select(col("text")).limit(5).collect().map(_.getString(0))
      .foreach { txt =>
        assert(chunksOf(txt).mkString("") === txt.toLowerCase)
      }
  }
}
