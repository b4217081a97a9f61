package graft.tools

import graft.ext.{IvfKMeans, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object IvfProfile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ivf] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
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
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    time("emb count")(emb.count())
    val centroids = time("trainCentroids")(IvfKMeans.trainCentroids(emb, 8))
    val assigned = IvfKMeans.assignCells(emb, centroids)
    time("assignCells")(assigned.write.format("noop").mode("overwrite").save())
    time("assignCells 2nd")(assigned.write.format("noop").mode("overwrite").save())
    time("cell histogram")(assigned.groupBy("cell").count().orderBy("cell").show(20))
    val persisted = assigned.persist()
    time("persist materialize")(persisted.count())
    time("bucketedNN persisted")(Similarity.bucketedNN(persisted, "cell")
      .write.format("noop").mode("overwrite").save())
    persisted.unpersist()
    time("bucketedNN")(Similarity.bucketedNN(assigned, "cell")
      .write.format("noop").mode("overwrite").save())
    val probes = IvfKMeans.probeCells(emb, centroids, 2)
    time("probeCells")(probes.write.format("noop").mode("overwrite").save())
    time("multiProbeNN")(Similarity.multiProbeNN(emb, centroids, 2, 3)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
