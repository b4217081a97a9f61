package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the per-query streaming fixed overhead: times a
  * stateful streaming drain (tumbling agg; transformWithState funnel)
  * under different `spark.sql.shuffle.partitions` — the state-store
  * instance count — to attribute the ~2.5-3.3 s stateful-vs-stateless
  * gap measured in BASELINE.md. Diagnostic only; not part of the
  * registry. Usage: StateOverheadProbe <sfDir> */
object StateOverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    def withPartitions(n: Int)(body: => Long): Long = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    def hourly(): Long = {
      val stream = graft.sources.Tables.eventsStream(spark, dir)
      val agg = graft.streaming.StreamingOps.tumbling(
        stream, "ts", "0 seconds", "1 hour",
        Seq("event_type"), Seq(count(lit(1)).as("n")))
        .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      graft.streaming.StreamingOps.runToParquet(agg, "probe_hourly").count()
    }
    def funnel(): Long = {
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
        ".state.RocksDBStateStoreProvider")
      try {
        val stream = graft.sources.Tables.eventsStream(spark, dir)
        graft.streaming.StreamingOps.runToParquet(
          graft.streaming.StreamingFunnel(
            stream, Seq("view", "click", "purchase"), within = "12 HOURS").toDF(),
          "probe_funnel").count()
      } finally prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    // warm everything once (JIT, readers, streaming machinery)
    time("warm hourly@32")(hourly())
    time("warm funnel@32")(funnel())
    for (n <- Seq(32, 8, 2)) {
      time(s"hourly@$n")(withPartitions(n)(hourly()))
      time(s"funnel@$n")(withPartitions(n)(funnel()))
    }
    // repeat at 32 to bound drift
    time("hourly@32 again")(hourly())
    time("funnel@32 again")(funnel())
    spark.stop()
  }
}
