package graft.tools

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CCProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()
    val pairs = Dedup.jaccardNearDup(docs, 0.7).select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs materialize")(println("  pairs=" + pairs.count()))
    val incident = pairs.select(col("doc_a").as("n"))
      .union(pairs.select(col("doc_b").as("n"))).distinct()
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .union(incident.select(col("n").as("a"), col("n").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = time("init labels + sum")(
      edges.groupBy("a").agg(min("b").as("m")).persist())
    time("  sum0")(println("  sum=" + labels.agg(sum(col("m").cast("decimal(38,0)"))).first().getDecimal(0)))
    var cur = labels
    for (i <- 1 to 2) {
      val next = time(s"round $i join+agg")(
        edges.join(cur.select(col("a").as("b"), col("m")), Seq("b"))
          .groupBy("a").agg(min("m").as("m")).persist())
      time(s"  sum$i")(println("  sum=" + next.agg(sum(col("m").cast("decimal(38,0)"))).first().getDecimal(0)))
      cur = next
    }
    time("stitch")(docs.select(col("doc_id"))
      .join(cur.select(col("a").as("doc_id"), col("m")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("m"), col("doc_id")))
      .write.format("noop").mode("overwrite").save())
    time("full operator")(Dedup.duplicateClusters(docs, 0.7)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
