package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timings for DedupIndex.build at bench scale: shingle+persist,
  * band aggregation, set aggregation, and the two partitioned writes —
  * to see which stage owns q_stream_dedup_against's ~3 s in-query
  * rebuild. Diagnostic only. Usage: DedupBuildProbe <sfDir> */
object DedupBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .where(col("doc_id") % 2 === 0)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dedupbuild] $label%-26s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm: one full build
    val base = spark.conf.get("spark.sql.warehouse.dir") + "/probe_dedup_idx"
    time("full build (cold)")(graft.ext.Dedup // touch kernels
      .docShingles(docs.limit(64)).count())
    time("full build (warm1)")(graft.ext.DedupIndex.build(docs, base))
    time("full build (warm2)")(graft.ext.DedupIndex.build(docs, base))
    // stage split
    val Lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = graft.ext.Dedup.docShingles(docs).persist(Lvl)
    time("shingle+persist+count")(sh.count())
    time("band agg only")(
      graft.ext.Dedup.minhashBandRows(sh, 3, 3).count())
    time("sets agg only")(
      sh.groupBy("doc_id").agg(
        expr("sort_array(collect_list(xxhash64(shingle)))").as("seth"),
        count(lit(1)).as("n_sh")).count())
    time("bands write")(
      graft.ext.Dedup.minhashBandRows(sh, 3, 3)
        .withColumn("bp", substring(col("bkey"), 1, 1))
        .repartition(col("bp")).sortWithinPartitions("bkey")
        .write.mode("overwrite").partitionBy("bp").parquet(s"$base/bands2"))
    time("sets write")(
      sh.groupBy("doc_id").agg(
        expr("sort_array(collect_list(xxhash64(shingle)))").as("seth"),
        count(lit(1)).as("n_sh"))
        .withColumn("dp", pmod(col("doc_id"), lit(16)).cast("int"))
        .repartition(col("dp")).sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("dp").parquet(s"$base/sets2"))
    sh.unpersist()
    // shuffle-partition sizing A/B: the two partitioned writes shuffle
    // to spark.sql.shuffle.partitions tasks; at bench scale the input
    // is <1 MB, so fewer tasks = fewer committer/file overheads
    for (n <- Seq(32, 16, 8, 16, 32)) {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      time(f"full build @$n%2d parts")(
        graft.ext.DedupIndex.build(docs, s"$base@$n"))
    }
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    spark.stop()
  }
}
