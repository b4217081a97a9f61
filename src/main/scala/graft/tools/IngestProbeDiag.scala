package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Why does q_stream_dedup_against cost ~3 s more than its batch twin
  * (identical build + probe work, one microbatch)? Times index build,
  * the direct batch probe, and the streamed probe, and prints the
  * partition count of the microbatch frame the transform sees.
  * Diagnostic only. Usage: IngestProbeDiag <sfDir> */
object IngestProbeDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ingest] $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    println("[ingest] batch docs partitions: " + docs.rdd.getNumPartitions)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/ingest_diag_idx"
    // warm kernels
    graft.ext.Dedup.minhashNearDup(docs.limit(64), 0.7).count()
    time("build (warm-ish)")(
      graft.ext.DedupIndex.build(docs.where(col("doc_id") % 2 === 0), path))
    val idx = graft.ext.DedupIndex.load(spark, path)
    val odd = docs.where(col("doc_id") % 2 === 1)
    // per-job wall clock: which jobs appear (and how much slower) in the
    // streamed probe vs the identical batch probe
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobLog.put(e.jobId, (e.time, 0L))
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobLog.computeIfPresent(e.jobId, (_, v) => (v._1, e.time))
    }
    spark.sparkContext.addSparkListener(jl)
    def dumpJobs(label: String): Unit = {
      Thread.sleep(300)
      import scala.jdk.CollectionConverters.ConcurrentMapHasAsScala
      val rows = jobLog.asScala.toSeq.sortBy(_._1)
      println(s"[ingest] jobs during $label: n=${rows.size} " +
        rows.map { case (id, (s0, s1)) => s"$id:${s1 - s0}ms" }.mkString(" "))
      jobLog.clear()
    }
    time("batch probe 1")(
      graft.ext.DedupIndex.searchAgainst(idx, odd, 0.7).count())
    dumpJobs("warmup")
    time("batch probe 2")(
      graft.ext.DedupIndex.searchAgainst(idx, odd, 0.7).count())
    dumpJobs("batch probe 2")
    def stream = {
      val schema = spark.read.parquet(s"$dir/documents.parquet").schema
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .where(col("doc_id") % 2 === 1)
    }
    time("streamed probe 1")(
      graft.streaming.StreamingOps.runBatchesToParquet(
        stream, "ingest_diag", { b =>
          println("[ingest] microbatch partitions: " + b.rdd.getNumPartitions +
            " rows=" + b.count())
          val c = b.sparkSession.conf
          println("[ingest] clone conf: aqe=" +
            c.get("spark.sql.adaptive.enabled") + " coalesce=" +
            c.get("spark.sql.adaptive.coalescePartitions.enabled") +
            " shuffle=" + c.get("spark.sql.shuffle.partitions") +
            " outer aqe=" + spark.conf.get("spark.sql.adaptive.enabled"))
          graft.ext.DedupIndex.searchAgainst(idx, b, 0.7)
        }).count())
    dumpJobs("streamed probe 1")
    time("streamed probe 2")(
      graft.streaming.StreamingOps.runBatchesToParquet(
        stream, "ingest_diag2", b => graft.ext.DedupIndex.searchAgainst(idx, b, 0.7)).count())
    dumpJobs("streamed probe 2")
    spark.stop()
  }
}
