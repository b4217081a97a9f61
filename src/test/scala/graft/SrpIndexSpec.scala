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

  test("append: grown index == self-join slice over the unioned corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpusA = vecsOf(docs.where(col("doc_id") % 4 === 0))
    val corpusB = vecsOf(docs.where(col("doc_id") % 4 === 2))
    val batch = vecsOf(docs.where(col("doc_id") % 2 === 1))
    val path = java.nio.file.Files.createTempDirectory("srpappend").toString
    try {
      SrpIndex.build(corpusA, path, dim = 128)
      val idx = SrpIndex.load(spark, path)
      val baseOnly = rows(SrpIndex.searchAgainst(idx, batch, 0.6))
      SrpIndex.append(corpusB, idx)
      val grown = rows(SrpIndex.searchAgainst(idx, batch, 0.6))
      val expected = Similarity.srpNearDup(vecsOf(docs), threshold = 0.6,
          dim = 128, bits = idx.bits, bands = idx.bands)
        .where(col("doc_a") % 2 =!= col("doc_b") % 2)
        .select(
          when(col("doc_a") % 2 === 1, col("doc_a")).otherwise(col("doc_b"))
            .as("doc_id"),
          when(col("doc_a") % 2 === 1, col("doc_b")).otherwise(col("doc_a"))
            .as("dup_of"),
          col("sim"))
      assert(grown === rows(expected))
      assert(grown.nonEmpty)
      // appended vectors genuinely contribute matches beyond the build
      assert(grown.size > baseOnly.size,
        "the sf0.001 corpus must have near-dups landing in the appended half")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("dedupAndIngest: cross-batch paraphrase dups caught, index grows " +
      "with survivors, compaction bounds files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val t1 = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa"
    val t3 = "stone river forest meadow valley summit canyon glacier " +
      "prairie tundra delta basin mesa butte ridge cliff"
    val t4 = "piano violin cello flute oboe clarinet bassoon trumpet " +
      "trombone tuba harp timpani marimba organ lute fiddle"
    val path = java.nio.file.Files.createTempDirectory("srpgrow").toString
    try {
      SrpIndex.build(
        vecsOf(Seq((0L, t1 + " one")).toDF("doc_id", "text")), path, dim = 128)
      val idx = SrpIndex.load(spark, path)
      // drain 1: 11 near-dups seed doc 0; 13 is fresh; 15 near-dups 13
      // INTRA-batch (the index cannot see 13 yet)
      val s1 = MemoryStream[(Long, String)]
      s1.addData(Seq((11L, t1 + " two"), (13L, t3), (15L, t3 + " extra")))
      val d1 = rows(SrpIndex.dedupAndIngest(
        vecsOf(s1.toDF().toDF("doc_id", "text")), idx, 0.6,
        maxFilesPerPartition = 1))
      assert(d1.map(p => (p._1, p._2)) === Seq((11L, 0L), (15L, 13L)))
      // drain 2: 21 near-dups 13 — which arrived in DRAIN 1 as a fresh
      // doc and must now be a corpus member; 23 is fresh
      val s2 = MemoryStream[(Long, String)]
      s2.addData(Seq((21L, t3 + " added"), (23L, t4)))
      val d2 = rows(SrpIndex.dedupAndIngest(
        vecsOf(s2.toDF().toDF("doc_id", "text")), idx, 0.6,
        maxFilesPerPartition = 1))
      assert(d2.map(p => (p._1, p._2)) === Seq((21L, 13L)),
        "a paraphrase of an earlier batch's survivor must be caught")
      // index holds the seed corpus plus exactly the first-seen docs
      assert(spark.read.parquet(s"$path/sigs").select("doc_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(0L, 13L, 23L))
      // per-batch compaction at maxFiles=1 keeps every partition at one file
      def partFileCounts(sub: String): Seq[Int] =
        new java.io.File(s"$path/$sub").listFiles()
          .filter(_.getName.contains("=")).toSeq
          .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      assert(partFileCounts("bands").forall(_ <= 1))
      assert(partFileCounts("sigs").forall(_ <= 1))
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
