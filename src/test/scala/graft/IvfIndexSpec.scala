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

  test("appendBatch: replayed batch and partial-retry orphans change nothing") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    val model = IvfPq.train(half, kCells = 8)
    val path = java.nio.file.Files.createTempDirectory("ivfidem").toString
    try {
      IvfIndex.build(half, model, path)
      IvfIndex.appendBatch(rest, model, path, batchId = 7L)
      val n1 = spark.read.parquet(s"$path/codes").count()
      assert(n1 === emb.count())
      // at-least-once redelivery of a COMMITTED batch: the marker makes
      // the replay a no-op
      IvfIndex.appendBatch(rest, model, path, batchId = 7L)
      assert(spark.read.parquet(s"$path/codes").count() === n1)
      // partial prior attempt of an UNcommitted batch: a stray b9-* file
      // sits in a cell dir (crash between move and marker) — the retry
      // must clean it, not double-append it
      val cellDir = new java.io.File(s"$path/codes").listFiles()
        .find(_.getName.startsWith("cell=")).get
      val src = cellDir.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(src.toPath,
        cellDir.toPath.resolve("b9-stale.parquet"))
      assert(spark.read.parquet(s"$path/codes").count() > n1)
      val delta = emb.where(col("vec_id") < 4).withColumn(
        "vec_id", col("vec_id") + lit(100000L))
      IvfIndex.appendBatch(delta, model, path, batchId = 9L)
      assert(spark.read.parquet(s"$path/codes").count() === n1 + delta.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
    }
  }

  test("compact: 50-batch ingest keeps per-cell files bounded, search parity") {
    import spark.implicits._
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
      .as[(Long, Array[Float])].collect().toSeq
    val model = IvfPq.train(half, kCells = 8)
    val grown = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    val fresh = java.nio.file.Files.createTempDirectory("ivffresh2").toString
    val maxFiles = 4
    try {
      IvfIndex.build(half, model, grown)
      // 50 microbatches of continuous ingest, compacting every 10 — the
      // long-running-ingest scenario appendOnIngest wires up
      val slices = rest.grouped(math.max(1, rest.size / 50)).toSeq
      def cellFileCounts(): Seq[Int] =
        new java.io.File(s"$grown/codes").listFiles()
          .filter(_.getName.startsWith("cell=")).toSeq
          .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      slices.zipWithIndex.foreach { case (s, i) =>
        IvfIndex.appendBatch(s.toDF("vec_id", "embedding"), model, grown, i.toLong)
        if (i % 10 == 9) IvfIndex.compact(grown, maxFiles)
      }
      // without compaction ~50 batches x touched cells would pile up; a
      // final pass must leave every cell at or under the bound
      IvfIndex.compact(grown, maxFiles)
      val counts = cellFileCounts()
      assert(counts.nonEmpty && counts.forall(_ <= maxFiles),
        s"per-cell file counts after compact: $counts")
      // compaction must not change WHAT the index holds: row count and
      // search results equal a fresh single-pass build of the union
      IvfIndex.build(emb, model, fresh)
      assert(spark.read.parquet(s"$grown/codes").count() === emb.count())
      def top(path: String) = IvfIndex.search(
        emb, path, col("vec_id") < 10, nprobe = 3, k = 5, rerank = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
      assert(top(grown).toSeq === top(fresh).toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(grown))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fresh))
    }
  }

  test("staleness accounting; recall drift on shifted appends motivates retrain") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    // appended data is DISTRIBUTION-SHIFTED (constant offset per dim):
    // the frozen codebooks never saw this region, so residual
    // quantization error explodes there — the drift the policy alarms on
    val shifted = emb.select(
      (col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(3.0f)).as("embedding"))
    val union = emb.union(shifted)
    val stale = java.nio.file.Files.createTempDirectory("ivfstale").toString
    val fresh = java.nio.file.Files.createTempDirectory("ivffresh3").toString
    try {
      IvfIndex.build(emb, IvfPq.train(emb, kCells = 8), stale)
      assert(IvfIndex.staleness(stale) === 0.0)
      IvfIndex.append(shifted, stale)
      assert(math.abs(IvfIndex.staleness(stale) - 0.5) < 1e-9)
      assert(IvfIndex.needsRetrain(stale, maxStaleFraction = 0.5))
      assert(!IvfIndex.needsRetrain(stale, maxStaleFraction = 0.51))
      IvfIndex.build(union, IvfPq.train(union, kCells = 8), fresh)
      assert(IvfIndex.staleness(fresh) === 0.0)
      // probes from the shifted region: the stale index must measure
      // worse recall@5 than the rebuilt one
      val probeF = col("vec_id") >= 100000L && col("vec_id") < 100010L
      val exact = graft.ext.Similarity.cosineTopK(union, probeF, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
      def recall(path: String): Double = {
        val got = IvfIndex.search(
            union, path, probeF, nprobe = 4, k = 5, rerank = 30)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
        val rs = exact.map { case (q, ids) =>
          (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
        rs.sum / rs.size
      }
      val (rStale, rFresh) = (recall(stale), recall(fresh))
      info(f"recall@5 stale=$rStale%.2f fresh=$rFresh%.2f")
      assert(rFresh > rStale,
        f"rebuilt index must beat the stale one: stale=$rStale%.2f fresh=$rFresh%.2f")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stale))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(fresh))
    }
  }
}
