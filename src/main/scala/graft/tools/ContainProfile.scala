package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock for the prefix-filtered containment path
  * ([[graft.ext.PipelineOps.containmentPairsPrefix]]):
  * contain-profile <sfDir> — isolates shingling, df-count, the fused
  * sets+prefix aggregation, candidate join, and array-intersect
  * verification so regressions name their stage. */
object ContainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[contain] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    docs.count()
    val t = 0.8
    val sh = graft.ext.Dedup.docShingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles (persist+count)") { println("  rows=" + sh.count()) }
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("df count") { df.write.format("noop").mode("overwrite").save() }
    val sorted = sort_array(collect_list(struct(col("df"), col("shingle"))))
    val sets = sh.join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(sorted.as("sorted"), count(lit(1)).as("n_sh"))
      .select(
        col("doc_id"),
        expr("transform(sorted, s -> s.shingle)").as("set"),
        col("n_sh"),
        expr("transform(slice(sorted, 1, " +
          s"cast(ceil(${1.0 - t} * n_sh) as int) + 1), " +
          "s -> s.shingle)").as("prefix"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets+prefix agg") { println("  docs=" + sets.count()) }
    val cand = sets
      .select(col("doc_id").as("doc_a"), explode(col("prefix")).as("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .where(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("candidate join") { println("  cand pairs=" + cand.count()) }
    val out = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa"),
        col("n_sh").as("na")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          col("na")).as("containment"))
      .where(col("containment") >= t)
    time("verify (array_intersect)") { println("  out=" + out.count()) }
    spark.stop()
  }
}
