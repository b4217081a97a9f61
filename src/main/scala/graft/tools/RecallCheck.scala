package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Re-stamps the self-validating ANN recall gates at arbitrary scale:
  * every learned-quantizer registry query emits (qid, exact_topk,
  * recall_ok) where `recall_ok` is the aggregate recall-vs-exact floor
  * computed INSIDE the query ([[graft.ext.Similarity.recallGate]]), and
  * the driver's oracle checks it at sf0.01 — this tool runs the same
  * queries at the dirs given (e.g. the x10 amplification, where no
  * oracle runs) and fails loudly if any gate row reports false.
  * q_simhash_fast's gate row ([[graft.ext.Dedup.simhashRecallGate]])
  * has shape (doc_a, doc_b, recall_ok) and is included the same way.
  * usage: RecallCheck <sfDir...> */
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
      "q_ivf_kmeans", "q_sq8_rerank", "q_pq_rerank", "q_opq_rerank",
      "q_ivfpq_rerank", "q_ivfopq_rerank", "q_ivf_index", "q_imi_nn",
      "q_hier_nn", "q_ivf_multiprobe", "q_ivf_filtered", "q_simhash_fast")
    var bad = 0
    args.foreach { dir =>
      names.foreach { name =>
        val got = graft.SparkEntry.queries(name)(spark, dir)
        val ok =
          if (got.columns.contains("recall_ok")) {
            val n = got.count()
            val failed = got.where(!col("recall_ok")).count()
            println(s"[recall] $dir $name rows=$n gate_failed=$failed " +
              (if (n > 0 && failed == 0) "OK" else "FAIL"))
            n > 0 && failed == 0
          } else {
            // exact-rerank shape (qid, cid, sim): must equal brute force
            val exact = graft.ext.Similarity.cosineTopK(
              graft.sources.Tables.load(spark, dir, "embeddings"),
              col("vec_id") < 10, 5)
            val missed = exact.select("qid", "cid")
              .exceptAll(got.select("qid", "cid")).count()
            val extra = got.select("qid", "cid")
              .exceptAll(exact.select("qid", "cid")).count()
            // id-set recall alone would pass right neighbors with wrong
            // scores: also gate sim against brute force (1e-5 tolerance
            // absorbs float-sum association order across partitionings)
            val simBad = got.alias("g")
              .join(exact.alias("e"), Seq("qid", "cid"))
              .where(abs(col("g.sim") - col("e.sim")) > lit(1e-5)).count()
            println(s"[recall] $dir $name missed=$missed extra=$extra " +
              s"sim_bad=$simBad " +
              (if (missed == 0 && extra == 0 && simBad == 0) "EXACT"
               else "DIVERGES"))
            missed == 0 && extra == 0 && simBad == 0
          }
        if (!ok) bad += 1
        spark.catalog.clearCache()
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
