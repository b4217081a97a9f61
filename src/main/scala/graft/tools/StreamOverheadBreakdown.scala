package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-phase breakdown of the streaming queries' fixed overhead
  * (VERDICT r13 #4): registers a [[StreamingQueryListener]], runs each
  * `q_stream_*` registry query once (after one warm-up drain), and
  * attributes the wall time per query to the microbatch phases Spark
  * itself reports in `StreamingQueryProgress.durationMs` —
  * queryPlanning / getBatch+latestOffset (source listing) / walCommit+
  * commitOffsets (checkpoint offset+commit log IO) / addBatch (the
  * actual work incl. state store) — plus the residual (query start/stop,
  * trigger scheduling, result assembly after the drain). Diagnostic
  * only. Usage: StreamOverheadBreakdown <sfDir> [queries...]
  */
object StreamOverheadBreakdown {
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

    // progress events arrive async; key phase sums by query runId
    val perRun = new java.util.concurrent.ConcurrentHashMap[
      java.util.UUID, mutable.Map[String, Long]]()
    val batchCount = new java.util.concurrent.ConcurrentHashMap[
      java.util.UUID, java.lang.Integer]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val m = perRun.computeIfAbsent(e.progress.runId,
          _ => mutable.Map.empty[String, Long].withDefaultValue(0L))
        e.progress.durationMs.forEach { (k, v) =>
          m.synchronized { m(k) = m(k) + v }
        }
        batchCount.merge(e.progress.runId, 1, (a, b) => a + b)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.filter(_.startsWith("q_stream_"))
        .toSeq.sorted
    // one warm drain to absorb JIT/reader init
    graft.SparkEntry.queries(names.head)(spark, dir)
      .write.format("noop").mode("overwrite").save()

    println(f"${"query"}%-26s ${"wall_s"}%7s ${"plan"}%6s ${"source"}%6s " +
      f"${"offlog"}%6s ${"addBatch"}%8s ${"residual"}%8s ${"batches"}%7s")
    names.foreach { name =>
      val before = scala.jdk.CollectionConverters
        .SetHasAsScala(perRun.keySet()).asScala.toSet
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // collect phases of every run started during this query (some
      // queries drain more than one stream); wait briefly for async
      // listener delivery
      Thread.sleep(300)
      val newRuns = scala.jdk.CollectionConverters
        .SetHasAsScala(perRun.keySet()).asScala.toSet.diff(before).toSeq
      val sum = mutable.Map.empty[String, Long].withDefaultValue(0L)
      var batches = 0
      newRuns.foreach { id =>
        val m = perRun.get(id)
        m.synchronized { m.foreach { case (k, v) => sum(k) = sum(k) + v } }
        batches += Option(batchCount.get(id)).map(_.intValue).getOrElse(0)
      }
      val plan = sum("queryPlanning") / 1e3
      val source = (sum("getBatch") + sum("latestOffset")) / 1e3
      val offlog = (sum("walCommit") + sum("commitOffsets")) / 1e3
      val add = sum("addBatch") / 1e3
      val trigger = sum("triggerExecution") / 1e3
      val residual = wall - trigger
      println(f"$name%-26s $wall%7.2f $plan%6.2f $source%6.2f " +
        f"$offlog%6.2f $add%8.2f $residual%8.2f $batches%7d")
    }
    spark.stop()
  }
}
