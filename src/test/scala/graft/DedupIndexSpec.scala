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
