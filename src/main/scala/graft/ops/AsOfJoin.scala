package graft.ops

import graft.core.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-time as-of join — the engine's flagship primitive, replacing the
  * reference's `FOR SYSTEM_TIME AS OF` temporal joins (App.java:200-205 and
  * 228-233). Each left ("probe") row at (key, asOfTime) is joined to the
  * latest version of the right table whose change time is <= asOfTime
  * (inclusive — normative semantics derived in SURVEY.md §2.5 from the
  * reference's golden output at App.java:80-81). LEFT semantics: a probe
  * with no version yet yields NULL values, not a dropped row
  * (App.java:204,231).
  *
  * The as-of time is a per-call *parameter* rather than stream metadata, so
  * the reference's event-time re-assignment workaround (App.java:207-225)
  * disappears: join #2 on a different time axis is just a second call.
  *
  * Algorithm (union-merge): tag version rows and probe rows, union them,
  * and run a single running `last(value, ignoreNulls)` window partitioned by
  * key and ordered by (time, side). Versions sort before probes at the same
  * instant, giving inclusive semantics; flip the side order for exclusive.
  *
  * Scale rationale: exactly ONE shuffle (by key) and one per-partition sort
  * over |probes| + |versions| rows — no join explosion, no per-probe-row
  * row_number repartition, and no broadcast requirement. At 100 TB this is
  * the canonical merge formulation: cost is a sort-shuffle of both inputs,
  * identical asymptotics to a sort-merge join, and it is skew-tolerant via
  * AQE because the heavy key's rows still form a single sorted run.
  */
object AsOfJoin {

  /** @param left       probe rows (any schema)
    * @param leftKey    probe join key column
    * @param asOfTime   probe column holding the as-of instant
    * @param right      versioned table supplying values
    * @param inclusive  version at exactly asOfTime visible? (reference: yes)
    * @param joinType   "left" (NULL values when no version) or "inner"
    */
  def asof(
      left: DataFrame,
      leftKey: String,
      asOfTime: String,
      right: VersionedTable,
      inclusive: Boolean = true,
      joinType: String = "left"): DataFrame = {
    require(Seq("left", "inner").contains(joinType), s"joinType=$joinType")
    val overlap = right.valueCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"value columns collide with probe columns: $overlap")

    val probeSide = if (inclusive) 1 else 0 // versions first at equal t <=> inclusive
    val verSide = 1 - probeSide

    val valueStruct = struct(right.valueCols.map(col): _*)
    val valueType = right.df.select(valueStruct).schema.head.dataType
    val probeStruct = struct(left.columns.map(col): _*)
    val probeType = left.select(probeStruct).schema.head.dataType

    val probes = left.select(
      col(leftKey).as("__k"),
      col(asOfTime).as("__t"),
      lit(probeSide).as("__side"),
      probeStruct.as("__probe"),
      lit(null).cast(valueType).as("__val"))
    val versions = right.df.select(
      col(right.keyCol).as("__k"),
      col(right.timeCol).as("__t"),
      lit(verSide).as("__side"),
      lit(null).cast(probeType).as("__probe"),
      valueStruct.as("__val"))

    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = probes
      .unionByName(versions)
      .withColumn("__asof", last(col("__val"), ignoreNulls = true).over(w))
      .where(col("__side") === probeSide && col("__probe").isNotNull)

    val kept = if (joinType == "inner") merged.where(col("__asof").isNotNull) else merged
    val outCols =
      left.columns.map(c => col("__probe").getField(c).as(c)) ++
        right.valueCols.map(c => col("__asof").getField(c).as(c))
    kept.select(outCols.toSeq: _*)
  }
}
