package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet testdata (TESTDATA.md).
  *
  * `events.parquet` stores `ts` as Parquet TIMESTAMP(NANOS), which Spark 4
  * rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it via the legacy
  * nanos-as-long escape hatch and rebuild a microsecond TimestampType with
  * *integer* division (`DIV 1000`) — a double-valued division would lose
  * precision (ns-since-epoch ≈ 1.7e18 > 2^53). The source data carries zero
  * sub-microsecond information, so this matches DuckDB's own ns→us coercion
  * exactly.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => df
    }
  }

  /** Runtime conf needed before any read of the events table. */
  def prepare(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    prepare(spark)
    load(spark, sfDir, "events")
  }
}
