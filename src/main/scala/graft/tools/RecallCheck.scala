package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Checks whether each exact-reranked ANN query returns EXACTLY the
  * brute-force top-k (recall@rerank == 1 end-to-end) — the precondition
  * for giving those queries the plain exact-top-k oracle SQL:
  * recall-check <sfDir...> */
object RecallCheck {
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
      exact.persist()
      names.foreach { name =>
        val got = graft.SparkEntry.queries(name)(spark, dir)
        val missed = exact.exceptAll(got).count()
        val extra = got.exceptAll(exact).count()
        println(s"[recall] $dir $name missed=$missed extra=$extra " +
          (if (missed == 0 && extra == 0) "EXACT" else "DIVERGES"))
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
