package graft.tools

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Phase-split profile of q_dup_clusters: pair generation (MinHash-LSH)
  * vs connected-components resolution, materialized separately vs fused. */
object DupProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[dup] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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

    // Phase-split: materialize pairs first, then resolve.
    import org.apache.spark.sql.functions._
    val pairsIn = Dedup.minhashNearDup(docs, 0.7).select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs materialize")(println("  pairs=" + pairsIn.count()))

    // inline resolveClusters with per-phase timers
    val pairs = pairsIn.select("doc_a", "doc_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incident = pairs.select(col("doc_a").as("n"))
      .union(pairs.select(col("doc_b").as("n"))).distinct()
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .union(incident.select(col("n").as("a"), col("n").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs count #2 (cached?)")(pairs.count())
    time("edges materialize")(edges.count())
    time("edges count #2 (cached?)")(edges.count())
    var labels = edges.groupBy("a").agg(min("b").as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("--- labels plan ---")
    labels.explain()
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("m").cast("decimal(38,0)"))).first().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = time("init labels + sum0")(labelSum(labels))
    var converged = false
    var round = 0
    while (!converged) {
      round += 1
      val next = edges
        .join(labels.select(col("a").as("b"), col("m")), Seq("b"))
        .groupBy("a").agg(min("m").as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s = time(s"round $round join+agg+sum")(labelSum(next))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
    }
    time("final stitch + write")(
      docs.select(col("doc_id"))
        .join(labels.select(col("a").as("doc_id"), col("m")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("m"), col("doc_id")).as("cluster_root"),
          (coalesce(col("m"), col("doc_id")) === col("doc_id")).as("keep"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
