package graft.tools

import graft.core.{EventTable, VersionedTable}
import graft.ops.AsOfJoin
import graft.sources.{BucketedTables, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale gate for the ZERO-EXCHANGE as-of path: persists the probe and
  * version sides of the flagship as-of workload as disk-bucketed tables
  * ([[BucketedTables]]), reruns [[AsOfJoin.asofMerge]] straight off disk,
  * ASSERTS the executed plan contains no Exchange, and times the probe
  * join alone (the recurring cost the layout exists to amortize; the
  * bucketed write is the one-time cost, timed separately). Run at sf0.1
  * and its x10 amplification for the BASELINE.md exponent row.
  * usage: asof-scale-gate <sfDir...> */
object AsOfScaleGate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val events = EventTable(Tables.events(spark, dir), "ts", Some("user_id"))
      val features = VersionedTable.fromEvents(
        events.where(col("event_type") === "error"), "user_id",
        sum(expr("cast(round(value * 100) as bigint)")) -> "err_cents")
      val probes = events.df.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
      val t0 = System.nanoTime()
      BucketedTables.saveForAsOf(probes, "gate_probes", "user_id", "ts")
      BucketedTables.saveVersioned(features, "gate_versions")
      val tWrite = (System.nanoTime() - t0) / 1e9
      val p = spark.table("gate_probes")
      val vt = BucketedTables.loadVersioned(spark, "gate_versions")
      val joined = AsOfJoin.asofMerge(p, "user_id", "ts", vt)
      // plan assertion FIRST: the whole point of the layout
      val plan = joined.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"),
        s"bucketed as-of plan must be exchange-free:\n$plan")
      val t1 = System.nanoTime()
      joined.write.format("noop").mode("overwrite").save()
      val tJoin1 = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      joined.write.format("noop").mode("overwrite").save()
      val tJoin2 = (System.nanoTime() - t2) / 1e9
      val rows = joined.count()
      println(f"[asof-scale] $dir zero_exchange=true rows=$rows " +
        f"write=$tWrite%.2f s join=${math.min(tJoin1, tJoin2)}%.2f s " +
        f"(runs $tJoin1%.2f/$tJoin2%.2f)")
      spark.sql("DROP TABLE IF EXISTS gate_probes")
      spark.sql("DROP TABLE IF EXISTS gate_versions")
    }
    spark.stop()
  }
}
