package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibrates the hygiene-pipeline v2 signal thresholds: distribution of
  * uniq_ratio / top_bigram_frac / dup3_frac / rare_rate and survivor
  * token mass per scale factor. usage: signal-stats <sfDir...> */
object SignalStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      def pct(df: org.apache.spark.sql.DataFrame, c: String): String = {
        val p = df.stat.approxQuantile(c, Array(0.5, 0.9, 0.95, 0.99, 1.0), 0.001)
        f"$c p50=${p(0)}%.3f p90=${p(1)}%.3f p95=${p(2)}%.3f p99=${p(3)}%.3f max=${p(4)}%.3f"
      }
      val rep = graft.ext.PipelineOps.repetitionScore(docs)
      val chars = graft.ext.TextOps.repetitionSignals(docs)
      val tri = graft.ext.TextOps.trigramRareRate(docs)
      println(s"[signal] $dir " + pct(rep, "uniq_ratio"))
      println(s"[signal] $dir " + pct(rep, "top_bigram_frac"))
      println(s"[signal] $dir " + pct(chars, "dup3_frac"))
      println(s"[signal] $dir " + pct(tri, "rare_rate"))
      val surv = graft.ext.PipelineOps.hygienePipeline(docs, col("doc_id") < 25)
      val m = surv.agg(count(lit(1)), sum("n_tokens")).collect().head
      println(s"[signal] $dir hygiene survivors=${m.getLong(0)} tokens=${m.getLong(1)}")
    }
    spark.stop()
  }
}
