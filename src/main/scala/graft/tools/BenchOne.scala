package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates Bench.scala's exact conditions for a subset of queries:
  * bench-one <sfDir> <cpus> <query...>  — for chasing per-query wall-clock
  * without running the whole registry. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val names = args.drop(2)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers extra
    // session confs on the bench baseline without editing the tool.
    // LIMITATION: values may not contain ';' (the pair separator) —
    // a semicolon-bearing value is silently truncated at the first ';'
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(";").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // repeat the whole list REPS times (default 1): interleaved A/B runs
    // read min-of-N per query from one JVM
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_BENCHONE_REPS", "1")
    val reps =
      try repsRaw.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_BENCHONE_REPS must be an int (got '$repsRaw')")
      }
    (1 to reps).foreach { rep =>
      names.foreach { name =>
        spark.catalog.clearCache()
        System.gc()
        spark.range(1000).count()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rep $rep)")
      }
    }
    spark.stop()
  }
}
