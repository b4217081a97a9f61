package graft

import graft.ext.PipelineOps
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus-hygiene on ingest: decontamination (stateless per-row
  * scoring, append mode) and containment (per-microbatch scoring against a
  * static reference index) both equal their batch counterparts even when
  * the corpus arrives across several microbatches. */
class StreamingPipelineSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The sf0.001 documents split into three parquet files so
    * maxFilesPerTrigger=1 forces THREE microbatches. */
  private def slicedDocsDir(): String = {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = java.nio.file.Files.createTempDirectory("slices").toString
    Seq(
      col("doc_id") % 3 === 0,
      col("doc_id") % 3 === 1,
      col("doc_id") % 3 === 2).zipWithIndex.foreach { case (p, i) =>
      val tmp = s"$dir/tmp_$i"
      docs.where(p).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(
        part.toPath, java.nio.file.Paths.get(dir, f"slice_$i%02d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    dir
  }

  test("hygiene-on-ingest == batch hygieneScore across 3 microbatches") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = slicedDocsDir()
    val profile = PipelineOps.buildHygieneProfile(docs, col("doc_id") < 25)
    try {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val got = PipelineOps.hygieneOnIngest(
        stream.where(col("doc_id") >= 25), profile)
      val want = PipelineOps.hygieneScore(
        profile, docs.where(col("doc_id") >= 25))
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // the frozen profile keeps corpus-wide floors batch-independent:
      // every surviving doc passed the REFERENCE corpus's df floor, not a
      // per-batch one (a per-batch floor would reclassify shared shingles
      // as rare inside small batches and let boilerplate through)
      assert(got.agg(max(col("boiler_ratio"))).collect().head.getDouble(0) <= 0.3)
    } finally {
      profile.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("decontaminate-on-ingest == batch decontaminate across 3 microbatches") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = slicedDocsDir()
    try {
      val evalSh = PipelineOps.evalShingleSet(docs.where(col("doc_id") < 25))
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val got = graft.streaming.StreamingOps.runToParquet(
        PipelineOps.decontaminateScore(
          stream.where(col("doc_id") >= 25), evalSh, maxFrac = 0.3),
        "spec_stream_decon")
      val want = PipelineOps.decontaminate(docs, col("doc_id") < 25, maxFrac = 0.3)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("boilerplate-on-ingest == batch boilerplate across 3 microbatches") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = slicedDocsDir()
    val refDf = PipelineOps.shingleDf(docs).persist()
    try {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val got = graft.streaming.StreamingOps.runBatchesToParquet(
        stream, "spec_stream_boiler",
        batch => PipelineOps.boilerplateAgainst(refDf, batch))
      val want = PipelineOps.boilerplate(docs)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // a doc full of reference-unseen shingles scores 0 boilerplate
      import spark.implicits._
      val novel = Seq((999999L, "zzq wwx vvy uut rrs qqp oon mml"))
        .toDF("doc_id", "text")
      val row = PipelineOps.boilerplateAgainst(refDf, novel).collect().head
      assert(row.getLong(2) === 0L && row.getBoolean(4))
    } finally {
      refDf.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("chunk-dedup-on-ingest == batch chunkDedup across 3 microbatches") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = slicedDocsDir()
    val refDf = PipelineOps.chunkDf(docs, 16).persist()
    try {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val got = graft.streaming.StreamingOps.runBatchesToParquet(
        stream, "spec_stream_chunk",
        batch => PipelineOps.chunkDedupAgainst(refDf, batch, 16))
      val want = PipelineOps.chunkDedup(docs, 16)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally {
      refDf.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("containment-on-ingest == batch containmentPairs across 3 microbatches") {
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = slicedDocsDir()
    val index = PipelineOps.buildContainmentIndex(docs)
    try {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val got = PipelineOps.containmentOnIngest(stream, index, 0.8)
      val want = PipelineOps.containmentPairs(docs, 0.8)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally {
      index.release()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
