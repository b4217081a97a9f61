package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Calibration for the winnowing df cap and the rolling-variant recall
  * gate: at each sfDir, prints (a) pair-set agreement between the
  * md5-portable and Karp-Rabin families under the scaled cap, and
  * (b) the rolling family's CANDIDATE coverage (share >= 1 capped
  * fingerprint) of the portable pairs — the MOSS-guarantee-level
  * property that must be ~1 for the fast path to be a valid candidate
  * generator. This tool is how the fixed cap 16 was caught silently
  * dropping 13% of true pairs at sf0.1 (agreement 0.76) and how
  * [[graft.ext.Dedup.winnowScaledCap]]'s max(16, n/100) was validated
  * (agreement 1.0, coverage 1.0 at sf0.001-0.1).
  * usage: WinnowCheck <sfDir...>  (WC_CAP overrides the cap) */
object WinnowCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val cap = sys.env.get("WC_CAP").map(_.toLong)
        .getOrElse(graft.ext.Dedup.winnowScaledCap(docs))
      val p = graft.ext.Dedup.winnowNearDup(docs, 0.7, maxDf = Some(cap))
      val f = graft.ext.Dedup.winnowNearDup(docs, 0.7, rolling = true, maxDf = Some(cap))
      val pp = p.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ff = f.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val fpAll = docs.select(col("doc_id"),
        explode(graft.functions.Winnow(spark, col("text"), 8, 4, rolling = true)).as("fp"))
      val rare = fpAll.groupBy("fp").agg(count(lit(1)).as("df"))
        .where(col("df") <= cap).select("fp")
      val fp = fpAll.join(rare, Seq("fp"), "left_semi")
      val cand = fp.select(col("doc_id").as("doc_a"), col("fp"))
        .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
        .where(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = math.max(1, pp.size)
      println(s"[winnowcheck] $dir cap=$cap portable=${pp.size} fast=${ff.size} " +
        f"agreement=${(pp & ff).size.toDouble / n}%.3f " +
        f"candCoverage=${(pp & cand).size.toDouble / n}%.3f")
    }
    spark.stop()
  }
}
