package graft

import graft.ext.{Dedup, Similarity, SrpIndex}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted SRP embedding near-dup index: probing the on-disk index
  * returns exactly what re-running the banding over corpus ∪ batch
  * returns (restricted to batch×corpus pairs), the streaming on-ingest
  * path is batching-invariant, the probe scan is partition-pruned, and
  * the candidate-volume guard covers the probe join. */
class SrpIndexSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def vecsOf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted.toSeq

  test("searchAgainst == srpNearDup over the union, batch x corpus slice; " +
      "meta round-trips; band scan pruned") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = vecsOf(docs.where(col("doc_id") % 2 === 0))
    val batch = vecsOf(docs.where(col("doc_id") % 2 === 1))
    val path = java.nio.file.Files.createTempDirectory("srpindex").toString
    try {
      val built = SrpIndex.build(corpus, path, dim = 128)
      val idx = SrpIndex.load(spark, path)
      assert(idx === built)

      val fromIndex = rows(SrpIndex.searchAgainst(idx, batch, 0.6))
      // reference: the self-join operator over ALL docs at the index's
      // own (bits, bands) — identical projection family, band shape and
      // hamming gate — sliced to the mixed-parity pairs and re-keyed
      // (doc_id = batch/odd, dup_of = corpus/even)
      val all = Similarity.srpNearDup(vecsOf(docs), threshold = 0.6,
        dim = 128, bits = idx.bits, bands = idx.bands)
      val expected = all
        .where(col("doc_a") % 2 =!= col("doc_b") % 2)
        .select(
          when(col("doc_a") % 2 === 1, col("doc_a")).otherwise(col("doc_b"))
            .as("doc_id"),
          when(col("doc_a") % 2 === 1, col("doc_b")).otherwise(col("doc_a"))
            .as("dup_of"),
          col("sim"))
      assert(fromIndex === rows(expected))
      assert(fromIndex.nonEmpty)

      // partition pruning: a bp predicate (what searchAgainst pushes)
      // reads strictly fewer files than the whole band table
      def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.executedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      val bands = spark.read.parquet(s"$path/bands")
      val someBp = bands.select("bp").limit(1).collect().head.getInt(0)
      assert(scannedFiles(bands.where(col("bp") === someBp)) <
        scannedFiles(bands),
        "bp-partitioned band table must prune unprobed partitions")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("semanticDedupOnIngest: microbatched probes == one batch probe") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = vecsOf(docs.where(col("doc_id") % 2 === 0))
    val batchRows = docs.where(col("doc_id") % 2 === 1)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("srpingest").toString
    try {
      SrpIndex.build(corpus, path, dim = 128)
      val idx = SrpIndex.load(spark, path)
      val input = MemoryStream[(Long, String)]
      batchRows.grouped(math.max(1, batchRows.size / 3))
        .foreach(c => input.addData(c))
      val streamed = rows(SrpIndex.semanticDedupOnIngest(
        vecsOf(input.toDF().toDF("doc_id", "text")), idx, 0.6))
      val batch = rows(SrpIndex.searchAgainst(
        idx, vecsOf(batchRows.toDF("doc_id", "text")), 0.6))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("probe join aborts with the bkey bucket diagnostic when the " +
      "ceiling is exceeded; default cap leaves the result unchanged") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = vecsOf(docs.where(col("doc_id") % 2 === 0))
    val batch = vecsOf(docs.where(col("doc_id") % 2 === 1))
    val path = java.nio.file.Files.createTempDirectory("srpguard").toString
    try {
      SrpIndex.build(corpus, path, dim = 128)
      val idx = SrpIndex.load(spark, path)
      val base = rows(SrpIndex.searchAgainst(idx, batch, 0.6))
      spark.conf.set(Dedup.MaxCandidatePairsConf, "1")
      val e = try intercept[Dedup.CandidateVolumeExceeded] {
        SrpIndex.searchAgainst(idx, batch, 0.6).count()
      } finally spark.conf.unset(Dedup.MaxCandidatePairsConf)
      assert(e.op === "srpSearchAgainst")
      assert(e.totalPairs > 1L)
      assert(e.topBuckets.nonEmpty && e.topBuckets.forall(_._2 > 0))
      assert(e.getMessage.contains(Dedup.MaxCandidatePairsConf))
      // guard off == default-cap result (the guard never changes output)
      spark.conf.set(Dedup.MaxCandidatePairsConf, "0")
      val off = try rows(SrpIndex.searchAgainst(idx, batch, 0.6))
      finally spark.conf.unset(Dedup.MaxCandidatePairsConf)
      assert(off === base)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }
}
