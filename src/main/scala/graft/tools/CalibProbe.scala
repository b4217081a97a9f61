package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The opportunistic bench-window gate (round-19 protocol): runs ONLY
  * Bench.scala's two fixed-work calibration jobs and prints one line
  *
  *   [calibprobe] cpu=<sec> shuffle=<sec> ok=<bool>
  *
  * where ok = shuffle < the threshold arg (default 1.0, the clean-window
  * band: adverse windows measured 1.3-3.5 on this box while clean
  * moments read 0.5-0.9). A campaign script probes BEFORE each single
  * bench leg and stamps per-query mins only from legs whose probe
  * passed — the cheap (~20 s incl. JVM spin-up) answer to "is this
  * moment worth a 7-minute leg", where the alternative was discovering
  * the weather in the leg's own calib fields after paying for it.
  * usage: CalibProbe [threshold] */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toDouble).getOrElse(1.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one untimed warm pass so codegen/scheduler init lands outside the
    // reading, same reason Bench warms before its timed region
    spark.range(1000000L).select(sum(col("id"))).collect()
    val c0 = System.nanoTime()
    spark.range(400L * 1000 * 1000)
      .select(sum(col("id") * 3 + 1)).collect()
    val cpu = (System.nanoTime() - c0) / 1e9
    val s0 = System.nanoTime()
    spark.range(30L * 1000 * 1000)
      .withColumn("k", pmod(col("id") * 2654435761L, lit(100000)))
      .groupBy("k").agg(sum(col("id")).as("s"))
      .agg(sum(col("s"))).collect()
    val shuffle = (System.nanoTime() - s0) / 1e9
    println(f"[calibprobe] cpu=$cpu%.2f shuffle=$shuffle%.2f " +
      s"ok=${shuffle < threshold}")
    spark.stop()
    if (shuffle >= threshold) sys.exit(3)
  }
}
