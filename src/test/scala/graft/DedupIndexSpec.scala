package graft

import graft.ext.{Dedup, DedupIndex}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted near-dup band index: probing the on-disk index returns
  * exactly what the recompute-everything path returns, appends make new
  * corpus docs visible, the probe scan is partition-pruned, and the
  * streaming ingest path equals the batch probe. */
class DedupIndexSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq

  test("searchAgainst == recompute path; meta round-trips; probe scan pruned") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("dedupindex").toString
    try {
      DedupIndex.build(corpus, path)
      val idx = DedupIndex.load(spark, path)
      assert((idx.bands, idx.rowsPerBand, idx.n) === ((3, 3, 3)))

      val fromIndex = pairs(DedupIndex.searchAgainst(idx, batch, 0.7))
      val recompute = pairs(Dedup.minhashNearDupAgainst(corpus, batch, 0.7))
      assert(fromIndex === recompute)
      assert(fromIndex.nonEmpty)

      // partition pruning: a band-key-prefix predicate (what searchAgainst
      // pushes) reads strictly fewer files than the whole band table
      def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      val bands = spark.read.parquet(s"$path/bands")
      val somePrefix = bands.select("bp").limit(1).collect().head.getString(0)
      assert(scannedFiles(bands.where(col("bp") === somePrefix)) <
        scannedFiles(bands),
        "bp-partitioned band table must prune unprobed prefixes")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("append: grown index == recompute against the unioned corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpusA = docs.where(col("doc_id") % 4 === 0)
    val corpusB = docs.where(col("doc_id") % 4 === 2)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("dedupappend").toString
    try {
      DedupIndex.build(corpusA, path)
      val idx = DedupIndex.load(spark, path)
      DedupIndex.append(corpusB, idx)
      val grown = pairs(DedupIndex.searchAgainst(idx, batch, 0.7))
      val recompute = pairs(
        Dedup.minhashNearDupAgainst(corpusA.union(corpusB), batch, 0.7))
      assert(grown === recompute)
      assert(grown.nonEmpty)
      // appended docs genuinely contribute matches beyond the base build
      val baseOnly = pairs(Dedup.minhashNearDupAgainst(corpusA, batch, 0.7))
      assert(grown.size > baseOnly.size,
        "the sf0.001 corpus must have near-dups landing in the appended half")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("compact: repeated appends stay bounded per partition, probe parity") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val corpusRows = docs.where(col("doc_id") % 2 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batch = docs.where(col("doc_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("dedupcompact").toString
    try {
      val (head, rest) = corpusRows.splitAt(math.max(1, corpusRows.size / 10))
      DedupIndex.build(head.toDF("doc_id", "text"), path)
      val idx = DedupIndex.load(spark, path)
      // 9 append batches of continuous corpus growth, then compact
      rest.grouped(math.max(1, rest.size / 9))
        .foreach(c => DedupIndex.append(c.toDF("doc_id", "text"), idx))
      val maxFiles = 3
      def partFileCounts(sub: String): Seq[Int] =
        new java.io.File(s"$path/$sub").listFiles()
          .filter(_.getName.contains("=")).toSeq
          .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      assert(partFileCounts("bands").exists(_ > maxFiles),
        "appends must have accumulated files for the test to mean anything")
      assert(DedupIndex.compact(path, maxFiles) > 0)
      assert(partFileCounts("bands").forall(_ <= maxFiles))
      assert(partFileCounts("sets").forall(_ <= maxFiles))
      // compaction must not change WHAT the index holds
      val compacted = pairs(DedupIndex.searchAgainst(idx, batch, 0.7))
      val recompute = pairs(Dedup.minhashNearDupAgainst(
        corpusRows.toDF("doc_id", "text"), batch, 0.7))
      assert(compacted === recompute)
      assert(compacted.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("dedupAndIngest: cross-batch dups caught, index grows with survivors") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val t1 = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val t2 = "red orange yellow green blue indigo violet crimson teal " +
      "magenta amber coral olive maroon navy silver"
    val t3 = "stone river forest meadow valley summit canyon glacier " +
      "prairie tundra delta basin mesa butte ridge cliff"
    val t4 = "piano violin cello flute oboe clarinet bassoon trumpet " +
      "trombone tuba harp timpani marimba organ lute fiddle"
    val path = java.nio.file.Files.createTempDirectory("dedupgrow").toString
    try {
      DedupIndex.build(Seq((0L, t1 + " one"), (2L, t2)).toDF("doc_id", "text"), path)
      val idx = DedupIndex.load(spark, path)
      // drain 1: 11 near-dups seed doc 0; 13 is fresh; 15 near-dups 13
      // INTRA-batch (the index cannot see 13 yet)
      val s1 = MemoryStream[(Long, String)]
      s1.addData(Seq((11L, t1 + " two"), (13L, t3), (15L, t3 + " extra")))
      val d1 = pairs(DedupIndex.dedupAndIngest(
        s1.toDF().toDF("doc_id", "text"), idx, 0.7))
      assert(d1.map(p => (p._1, p._2)) === Seq((11L, 0L), (15L, 13L)))
      // drain 2: 21 near-dups 13 — which arrived in DRAIN 1 as a fresh
      // doc and must now be a corpus member; 23 is fresh
      val s2 = MemoryStream[(Long, String)]
      s2.addData(Seq((21L, t3 + " added"), (23L, t4)))
      val d2 = pairs(DedupIndex.dedupAndIngest(
        s2.toDF().toDF("doc_id", "text"), idx, 0.7))
      assert(d2.map(p => (p._1, p._2)) === Seq((21L, 13L)),
        "a duplicate of an earlier batch's survivor must be caught")
      // index holds the seed corpus plus exactly the first-seen docs
      assert(spark.read.parquet(s"$path/sets").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(0L, 2L, 13L, 23L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("nearDupOnIngest: microbatched probes == one batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batchRows = docs.where(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("dedupingest").toString
    try {
      DedupIndex.build(corpus, path)
      val idx = DedupIndex.load(spark, path)
      val input = MemoryStream[(Long, String)]
      batchRows.grouped(math.max(1, batchRows.size / 3))
        .foreach(c => input.addData(c))
      val streamed = pairs(DedupIndex.nearDupOnIngest(
        input.toDF().toDF("doc_id", "text"), idx, 0.7))
      val batch = pairs(DedupIndex.searchAgainst(
        idx, batchRows.toDF("doc_id", "text"), 0.7))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }
}
