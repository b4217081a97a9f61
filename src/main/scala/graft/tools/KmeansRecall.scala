package graft.tools

import graft.ext.{IvfKMeans, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibrates the q_ivf_kmeans recall gate: measured aggregate recall@5 of
  * the single-probe learned-cell self-search (within-cell top-5) against
  * the exact top-5, per scale factor. The gate floor must sit below every
  * measured value with margin and far above a broken pipeline's ~0.
  * usage: kmeans-recall <sfDir...> */
object KmeansRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
        .select("vec_id", "embedding")
      val kCells = IvfKMeans.scaledK(emb.count())
      val centroids = IvfKMeans.trainCentroids(
        emb, kCells, sampleN = math.max(2048, 16 * kCells))
      val assigned = IvfKMeans.assignCells(emb, centroids)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ann = graft.ext.Lineage.cut(
        Similarity.bucketedNN(assigned, "cell", k = 5))
        .select(col("vec_id").as("qid"), col("nn_id").as("cid"))
      assigned.unpersist()
      val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
        .select("qid", "cid")
      val n = exact.count()
      val hits = exact.join(ann, Seq("qid", "cid"), "left_semi").count()
      println(f"[kmeans-recall] $dir kCells=$kCells recall@5=${hits.toDouble / n}%.3f ($hits/$n)")
      // hierarchical two-level variant (calibrates the q_hier_nn gate)
      val (k1, k2) = graft.ext.HierIvf.scaledKs(emb.count())
      val hm = graft.ext.HierIvf.train(emb, k1, k2)
      val hAnn = graft.ext.HierIvf.nn(
          emb, hm, k = 5, probeFilter = col("vec_id") < 10)
        .select(col("qid"), col("nn_id").as("cid"))
      val hHits = exact.join(hAnn, Seq("qid", "cid"), "left_semi").count()
      println(f"[hier-recall] $dir k1=$k1 k2=$k2 " +
        f"recall@5=${hHits.toDouble / n}%.3f ($hHits/$n)")
    }
    spark.stop()
  }
}
