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
    * buffers them. This is the S4 file-sink shape a 100 TB run uses; the
    * read-back is for the correctness gate. */
  def runToParquet(df: DataFrame, name: String): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val spark = df.sparkSession
    val dir = java.nio.file.Files.createTempDirectory(s"graft_stream_$name").toString
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode("append").parquet(dir)
      }
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // zero-batch stream: no files were written; preserve the schema
    val wrote = new java.io.File(dir).listFiles()
      .exists(f => f.getName.endsWith(".parquet"))
    if (wrote) spark.read.schema(df.schema).parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], df.schema)
  }
}
