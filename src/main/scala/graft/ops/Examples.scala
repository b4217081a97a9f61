package graft.ops

import graft.core.EventTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example generation: scan an event table with a row-frame OVER
  * window and emit (entity, prediction_time, label_time) rows wherever a
  * trigger condition over the recent per-key history holds — the engine form
  * of the reference's example query (App.java:64-77: "defeat_count = 2",
  * i.e. both of the last two games lost).
  *
  * Scale: one shuffle on the key + per-key sort; the row frame looks back a
  * constant number of rows, so state per key is O(lookback).
  */
object Examples {

  /** @param events     source event table (keyCol required)
    * @param windowAgg  aggregate evaluated over the trailing row frame,
    *                   e.g. `count(nullif(col("won"), lit(true)))`
    * @param lookback   rows preceding the current one in the frame
    *                   (reference uses 1: "ROWS BETWEEN 1 PRECEDING AND
    *                   CURRENT ROW", App.java:73)
    * @param trigger    predicate on the aggregate's result column `__agg`
    * @param labelDelay SQL interval expression for label time, e.g.
    *                   "INTERVAL 1 HOUR" (reference: TIMESTAMPADD(HOUR, 1,
    *                   ts), App.java:65)
    * @param orderCols  extra ordering columns after event time, to make tied
    *                   timestamps deterministic
    */
  def generate(
      events: EventTable,
      windowAgg: Column,
      lookback: Int,
      trigger: Column => Column,
      labelDelay: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val key = events.keyCol.getOrElse(
      throw new IllegalArgumentException("Examples.generate needs a keyed EventTable"))
    val time = events.timeCol
    val w = Window
      .partitionBy(col(key))
      .orderBy((col(time) +: orderCols.map(col)): _*)
      .rowsBetween(-lookback, Window.currentRow)
    events.df
      .withColumn("__agg", windowAgg.over(w))
      .where(trigger(col("__agg")))
      .select(
        col(key).as("_entity"),
        col(time).as("_prediction_time"),
        (col(time) + expr(labelDelay)).as("_label_time"))
  }
}
