package graft.tools

import graft.ext.{IvfKMeans, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

object IvfExplain {
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
    val centroids = IvfKMeans.trainCentroids(emb, 8)
    val assigned = IvfKMeans.assignCells(emb, centroids)
    val nn = Similarity.bucketedNN(assigned, "cell")
    nn.explain("formatted")
  }
}
