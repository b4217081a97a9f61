package graft.tools

import graft.core.{EventTable, VersionedTable}
import graft.ops.AsOfJoin
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head of the three as-of formulations on the same workload
  * (purchases probing cumulative error cents at sf0.1):
  * union-merge (1 shuffle + window), Catalyst-native merge join
  * (co-partition + per-partition two-pointer), broadcast (zero probe
  * shuffle). */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = EventTable(Tables.events(spark, sfDir), "ts", Some("user_id"))
    val features = VersionedTable.fromEvents(
      events.where(col("event_type") === "error"), "user_id",
      sum(expr("cast(round(value * 100) as bigint)")) -> "err_cents")
    val probes = events.df.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      .persist()
    val vdf = features.df.persist()
    val vt = VersionedTable(vdf, features.keyCol, features.timeCol, features.valueCols)
    probes.count(); vdf.count()

    def time(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[asofbench] $label run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }
    time("union-merge ")(AsOfJoin.asof(probes, "user_id", "ts", vt)
      .write.format("noop").mode("overwrite").save())
    time("native merge")(AsOfJoin.asofMerge(probes, "user_id", "ts", vt)
      .write.format("noop").mode("overwrite").save())
    time("broadcast   ")(AsOfJoin.asofBroadcast(probes, "user_id", "ts", vt)
      .write.format("noop").mode("overwrite").save())

    // Synthetic large case: per-ROW kernel cost only shows once inputs dwarf
    // fixed job overhead (20M probes / 2M versions over 200k keys — the
    // shape of a wide-cluster partition at 100 TB).
    val bigProbes = spark.range(20000000L)
      .select((col("id") % 200000L).as("user_id"),
        timestamp_micros(col("id") * 7L % 1000000000L).as("ts"),
        col("id").as("payload"))
      .persist()
    val bigVersions = spark.range(2000000L)
      .select((col("id") % 200000L).as("user_id"),
        timestamp_micros(col("id") * 61L % 1000000000L).as("_time"),
        (col("id") * 3L).as("feat"))
      .persist()
    bigProbes.count(); bigVersions.count()
    val bigVt = VersionedTable(bigVersions, "user_id", "_time", Seq("feat"))
    time("BIG union-merge ")(AsOfJoin.asof(bigProbes, "user_id", "ts", bigVt)
      .write.format("noop").mode("overwrite").save())
    time("BIG native merge")(AsOfJoin.asofMerge(bigProbes, "user_id", "ts", bigVt)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
