package graft.tools

import graft.core.VersionedTable
import graft.ops.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plan of the Catalyst-native as-of merge join —
  * quick check that AsOfMergeJoin sits INSIDE a WholeStageCodegen stage
  * (long-backed keys) and falls back outside it for generic key types. */
object AsOfExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE re-plans (and codegen-collapses) per query stage at runtime;
      // disable it here so the static plan shows the codegen stages
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val probes = spark.range(100)
      .select(col("id").as("user_id"),
        timestamp_micros(col("id") * 7L).as("ts"), col("id").as("payload"))
    val versions = spark.range(50)
      .select(col("id").as("user_id"),
        timestamp_micros(col("id") * 3L).as("_time"), (col("id") * 2L).as("feat"))
    val vt = VersionedTable(versions, "user_id", "_time", Seq("feat"))
    val joined = AsOfJoin.asofMerge(probes, "user_id", "ts", vt)
      .where(col("feat") > 10).select(col("payload"), col("feat"))
    val plan = joined.queryExecution.executedPlan.toString
    println(plan)
    val inStage = plan.linesIterator.exists(l =>
      l.contains("AsOfMergeJoin") && l.contains("*("))
    println(s"[asofexplain] merge join codegen'd (starred): $inStage")
    spark.stop()
  }
}
