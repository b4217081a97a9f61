package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fingerprint-frequency diagnostics for the winnowing variants: the
  * self-join volume is Σ df² over fingerprints, so a handful of hot
  * fingerprints (hash degeneracies, boilerplate runs) turns the pair
  * join quadratic. Prints the df histogram head + Σ df² for the
  * md5-portable and rolling hash modes. usage: WinnowProfile <sfDir> */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.prepare(spark)
    val docs = Tables.load(spark, dir, "documents").repartition(32)
    Seq(false, true).foreach { rolling =>
      val t0 = System.nanoTime()
      val fp = docs.select(
        col("doc_id"),
        explode(graft.functions.Winnow(spark, col("text"), 8, 4, rolling)).as("fp"))
      val df = fp.groupBy("fp").agg(count(lit(1)).as("df")).persist()
      val stats = df.agg(
        count(lit(1)).as("n_fp"),
        sum(col("df")).as("rows"),
        sum(col("df") * col("df")).as("sum_df2"),
        max(col("df")).as("max_df")).first()
      val top = df.orderBy(col("df").desc).limit(5).collect()
        .map(r => r.getLong(1)).mkString(",")
      println(f"[winnow] rolling=$rolling n_fp=${stats.getLong(0)} " +
        f"rows=${stats.getLong(1)} sum_df2=${stats.getLong(2)} " +
        f"max_df=${stats.getLong(3)} top5=[$top] " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      df.unpersist()
    }
    spark.stop()
  }
}
