package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-probe recall@5 distribution for the exact-reranked ANN queries —
  * picks the floor for the self-validating recall gates:
  * recall-dist <sfDir...> */
object RecallDist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "q_pq_rerank", "q_opq_rerank", "q_ivfpq_rerank", "q_ivfopq_rerank",
      "q_ivf_index")
    args.foreach { dir =>
      val exact = graft.ext.Similarity.cosineTopK(
        graft.sources.Tables.load(spark, dir, "embeddings"),
        col("vec_id") < 10, 5)
        .select(col("qid"), col("cid")).persist()
      exact.count()
      names.foreach { name =>
        val got = graft.SparkEntry.queries(name)(spark, dir)
          .select(col("qid"), col("cid"))
        val hits = exact.join(got, Seq("qid", "cid"))
          .groupBy("qid").agg(count(lit(1)).as("hits"))
        val per = exact.select("qid").distinct()
          .join(hits, Seq("qid"), "left")
          .select(col("qid"), coalesce(col("hits"), lit(0)).as("hits"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        println(s"[dist] $dir $name " +
          per.map { case (q, h) => s"$q:$h" }.mkString(" "))
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
