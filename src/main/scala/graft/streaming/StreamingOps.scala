package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch operators (SURVEY.md §2.6):
  * watermark declaration is a parameter everywhere (the reference hard-codes
  * zero lateness, App.java:121; T1), and the changelog/versioned-table
  * machinery (T2/T3) becomes either update-mode aggregation state or the
  * explicit per-key state of [[StreamingFlagship]]. */
object StreamingOps {

  /** Continuous grouped aggregation (A1/A2 streaming form): the query
    * result is the dynamic table; read it in update/complete output mode.
    * State = one row per key (Spark's streaming-agg state store). */
  def runningAggregate(
      events: DataFrame, timeCol: String, delay: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Tumbling event-time window aggregation; append mode emits each window
    * once the watermark passes its end. */
  def tumbling(
      events: DataFrame, timeCol: String, delay: String, width: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy((window(col(timeCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with an inactivity gap. */
  def sessionized(
      events: DataFrame, timeCol: String, delay: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy((session_window(col(timeCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup bounded by the watermark (state stays finite). */
  def dedupWithinWatermark(
      events: DataFrame, timeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Drain a streaming DataFrame (AvailableNow) through a DISTRIBUTED sink
    * and hand the result back as a batch DataFrame: each microbatch appends
    * to parquet via foreachBatch — executors write their own partitions, so
    * results never funnel through driver memory the way `format("memory")`
    * buffers them.
    *
    * Sink location: `sinkDir` when given — the production S4 shape, shared
    * storage the user designates; output stays there and the returned frame
    * reads it. When omitted, a scratch dir under the session's warehouse
    * dir (shared storage on a real cluster, unlike a driver-local temp
    * path) is used, the bounded result is materialized off it, and the
    * scratch dir is deleted — nothing leaks per run. */
  def runToParquet(df: DataFrame, name: String, sinkDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val spark = df.sparkSession
    val dir = sinkDir.getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      s"$wh/graft_stream/${name}_${java.util.UUID.randomUUID().toString.take(8)}"
    }
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(dir)
      }
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // zero-batch stream: no files were written; preserve the schema
    val wrote = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.endsWith(".parquet"))
    if (sinkDir.isDefined) {
      if (wrote) spark.read.schema(df.schema).parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], df.schema)
    } else {
      // scratch mode: materialize the (bounded, watermark-closed) result,
      // then remove the scratch dir so repeated gate runs leave no residue
      val out =
        if (wrote) spark.read.schema(df.schema).parquet(dir).localCheckpoint()
        else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], df.schema)
      if (fs.exists(hPath)) fs.delete(hPath, true)
      out
    }
  }
}
