package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-costs behind the streaming rows' fixed overhead (round-15
  * follow-up to [[StreamOverheadBreakdown]]): (a) the per-query batch
  * `spark.read.parquet(...).schema` read every file-stream query pays
  * before `readStream` (file streams need an explicit schema), warm and
  * cold; (b) the [[graft.ext.DedupIndex.build]] phases — shared shingle
  * materialization, band/set writes, meta write — that make up
  * q_stream_dedup_against's in-query rebuild; (c) a bare start/stop
  * AvailableNow drain of a one-row stream, the floor any streaming query
  * pays regardless of work. Diagnostic only.
  * Usage: StreamFixedCostProbe <sfDir> */
object StreamFixedCostProbe {
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
      println(f"[fixedcost] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }

    // (a) schema read, cold then warm x3
    time("schema read (cold)")(
      spark.read.parquet(s"$dir/documents.parquet").schema)
    (1 to 3).foreach(i => time(s"schema read (warm $i)")(
      spark.read.parquet(s"$dir/documents.parquet").schema))

    // (c) bare drain floor: one-row memory-ish stream via a 1-row parquet
    val tiny = s"${spark.conf.get("spark.sql.warehouse.dir")}/fixed_tiny"
    spark.range(1).toDF("id").write.mode("overwrite").parquet(tiny)
    val tinySchema = spark.read.parquet(tiny).schema
    def bareDrain(): Unit = graft.streaming.StreamingOps.runToParquet(
      spark.readStream.schema(tinySchema).parquet(tiny), "fixed_bare").count()
    time("bare drain (cold)")(bareDrain())
    (1 to 3).foreach(i => time(s"bare drain (warm $i)")(bareDrain()))

    // (c2) bare drain dissection: event-time stamps across one drain
    {
      val stamps = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
          stamps.put("started", System.nanoTime())
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          stamps.putIfAbsent("firstProgress", System.nanoTime())
          println("[fixedcost] durationMs: " + e.progress.durationMs)
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          stamps.put("terminated", System.nanoTime())
      }
      spark.streams.addListener(l)
      val t0 = System.nanoTime()
      // graft_ckpt_* prefix so StreamingOps.reapStaleScratch covers a
      // crashed probe's leftovers; a clean run deletes it right below
      val ckpt = java.nio.file.Paths.get("/dev/shm/graft_ckpt_probe_" + t0)
      val q = spark.readStream.schema(tinySchema).parquet(tiny)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val tStartRet = System.nanoTime()
      q.awaitTermination()
      val tAwait = System.nanoTime()
      try {
        import scala.jdk.CollectionConverters.IteratorHasAsScala
        scala.util.Using.resource(java.nio.file.Files.walk(ckpt)) { s =>
          s.iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      } catch { case scala.util.control.NonFatal(_) => }
      Thread.sleep(400)
      spark.streams.removeListener(l)
      def ms(k: String) = Option(stamps.get(k)).filter(_ != 0)
        .map(v => f"${(v - t0) / 1e6}%8.1f").getOrElse("      --")
      println(f"[fixedcost] dissect: start() returned ${(tStartRet - t0) / 1e6}%8.1f ms; " +
        f"started=${ms("started")} firstProgress=${ms("firstProgress")} " +
        f"terminated=${ms("terminated")} await=${(tAwait - t0) / 1e6}%8.1f")
    }

    // (b) DedupIndex.build phases on the even-id half (the
    // q_stream_dedup_against rebuild), after a kernel warm-up
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    graft.ext.Dedup.minhashNearDup(docs.limit(64), 0.7).count()
    val even = docs.where(col("doc_id") % 2 === 0)
    val path = spark.conf.get("spark.sql.warehouse.dir") + "/fixed_idx"
    (1 to 2).foreach { round =>
      val sh = graft.ext.Dedup.docShingles(even, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"build.$round shingle materialize")(sh.count())
      time(s"build.$round bands write")(
        graft.ext.Dedup.minhashBandRows(sh, 3, 3)
          .withColumn("bp", substring(col("bkey"), 1, 1))
          .repartition(col("bp")).sortWithinPartitions("bkey")
          .write.mode("overwrite").partitionBy("bp").parquet(s"$path/bands"))
      time(s"build.$round sets write")(
        sh.groupBy("doc_id").agg(
            expr("sort_array(collect_list(xxhash64(shingle)))").as("seth"),
            count(lit(1)).as("n_sh"))
          .withColumn("dp", pmod(col("doc_id"), lit(16)).cast("int"))
          .repartition(col("dp")).sortWithinPartitions("doc_id")
          .write.mode("overwrite").partitionBy("dp").parquet(s"$path/sets"))
      sh.unpersist()
      time(s"build.$round full build()")(
        graft.ext.DedupIndex.build(even, s"${path}_full"))
      // load via the REAL layout build() just wrote (meta.json sidecar);
      // the pre-round-15 one-row parquet meta job this used to time is
      // gone from the shipped build/load path
      time(s"build.$round load")(
        graft.ext.DedupIndex.load(spark, s"${path}_full"))
    }
    spark.stop()
  }
}
