package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** An append-only table of timestamped rows — the engine's fundamental
  * abstraction, replacing the reference's "DataStream + schema-with-watermark"
  * (reference: App.java:38-41, 99-122; watermark declaration App.java:121).
  *
  * Batch-first: `df` is a plain DataFrame and `timeCol` names the event-time
  * column. Unlike Flink, no watermark is needed for batch correctness — the
  * engine's operators are order-insensitive (they sort by event time where
  * semantics require it). `toStreaming` applies a real watermark for the
  * Structured Streaming path.
  */
final case class EventTable(
    df: DataFrame,
    timeCol: String,
    keyCol: Option[String] = None) {

  require(df.columns.contains(timeCol), s"missing time column $timeCol")
  keyCol.foreach(k => require(df.columns.contains(k), s"missing key column $k"))

  /** Streaming view with an explicit allowed-lateness (the reference hard-codes
    * zero delay, App.java:121; we expose it as a parameter per SURVEY §2.6). */
  def toStreaming(delay: String = "0 seconds"): DataFrame =
    df.withWatermark(timeCol, delay)

  /** Register for SQL access (reference: createTemporaryView, App.java:99). */
  def createOrReplaceTempView(name: String): Unit =
    df.createOrReplaceTempView(name)

  def where(cond: org.apache.spark.sql.Column): EventTable = copy(df = df.where(cond))
}
