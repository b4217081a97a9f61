package graft

import graft.ext.{IvfIndex, IvfKMeans, IvfPq}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted cell-partitioned ANN index: model round-trips through the
  * sidecars, search-from-index returns exactly what in-memory search
  * returns, and the code scan reads ONLY the probed cell partitions. */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("index search == in-memory search; model round-trips; scan is pruned") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val model = IvfPq.train(emb, kCells = 8)
    val path = java.nio.file.Files.createTempDirectory("ivfindex").toString
    try {
      IvfIndex.build(emb, model, path)

      // model sidecar round-trip is exact
      val loaded = IvfIndex.load(path)
      assert(loaded.centroids.length === model.centroids.length)
      assert(loaded.flat.toSeq === model.flat.toSeq)
      assert(loaded.pq === model.pq.copy(
        flat = loaded.pq.flat, normSq = loaded.pq.normSq))
      assert(loaded.pq.flat.toSeq === model.pq.flat.toSeq)
      assert(loaded.pq.normSq.toSeq === model.pq.normSq.toSeq)

      // identical results to the in-memory path with the same model
      val fromIndex = IvfIndex.search(
        emb, path, col("vec_id") < 10, nprobe = 3, k = 5, rerank = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val inMemory = IvfPq.search(
        emb, model, col("vec_id") < 10, nprobe = 3, k = 5, rerank = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(fromIndex.toSeq === inMemory.toSeq)
      assert(fromIndex.nonEmpty)

      // partition pruning: a single-cell predicate reads strictly fewer
      // files than the full index holds
      val all = spark.read.parquet(s"$path/codes")
      def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
        val scans: Seq[Long] =
          df.queryExecution.executedPlan.collectLeaves().collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec =>
              f.selectedPartitions.totalNumberOfFiles
          }
        scans.sum
      }
      val total = scannedFiles(all)
      val one = scannedFiles(all.where(col("cell") === 0))
      assert(one < total, s"pruned scan $one must read fewer files than $total")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("append: build half, append rest == fresh build of union, same model") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    val model = IvfPq.train(half, kCells = 8)
    val grown = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val fresh = java.nio.file.Files.createTempDirectory("ivffresh").toString
    try {
      IvfIndex.build(half, model, grown)
      IvfIndex.append(rest, grown)
      // the appended index must be indistinguishable from one built in a
      // single pass over the union with the same (half-trained) model —
      // append encodes with load()'s model, never retrains
      IvfIndex.build(emb, model, fresh)
      def top(path: String) = IvfIndex.search(
        emb, path, col("vec_id") < 10, nprobe = 3, k = 5, rerank = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      val g = top(grown)
      assert(g.toSeq === top(fresh).toSeq)
      assert(g.nonEmpty)
      // appended rows are really in the searchable code table
      assert(spark.read.parquet(s"$grown/codes").count() === emb.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(grown))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fresh))
    }
  }

  test("streaming ingest: microbatched appendOnIngest == one batch append; " +
      "checkpoint makes a re-drain a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq
    val model = IvfPq.train(half, kCells = 8)
    val streamed = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val batched = java.nio.file.Files.createTempDirectory("ivfbatch").toString
    try {
      IvfIndex.build(half, model, streamed)
      IvfIndex.build(half, model, batched)
      val input = MemoryStream[(Long, Array[Float])]
      rest.grouped(math.max(1, rest.size / 3)).foreach(c => input.addData(c))
      IvfIndex.appendOnIngest(
        input.toDF().toDF("vec_id", "embedding"), streamed)
      IvfIndex.append(
        rest.toDF("vec_id", "embedding"), batched)
      def top(path: String) = IvfIndex.search(
        emb, path, col("vec_id") < 10, nprobe = 3, k = 5, rerank = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(top(streamed).toSeq === top(batched).toSeq)
      val n = spark.read.parquet(s"$streamed/codes").count()
      assert(n === emb.count())
      // the checkpoint remembers the drained batches: replaying the same
      // stream appends nothing
      val replay = MemoryStream[(Long, Array[Float])]
      rest.grouped(math.max(1, rest.size / 3)).foreach(c => replay.addData(c))
      IvfIndex.appendOnIngest(
        replay.toDF().toDF("vec_id", "embedding"), streamed)
      assert(spark.read.parquet(s"$streamed/codes").count() === n)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(streamed))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(batched))
    }
  }
}
