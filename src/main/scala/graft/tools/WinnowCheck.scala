package graft.tools

import org.apache.spark.sql.SparkSession

/** Validation for the winnowing near-dup operator: at each sfDir, prints
  * (a) pair-set agreement between the md5-portable and Karp-Rabin hash
  * families (must be ~1 on this corpus's wide overlap margins for the
  * fast path's recall gate to hold), and (b) pair-set equality between
  * the rarest-first PREFIX-FILTERED candidate generator and the direct
  * all-pairs fingerprint self-join — the losslessness claim, verified
  * end-to-end rather than only argued by pigeonhole. Historical note:
  * this tool (in its df-cap era) is how the fixed cap 16 was caught
  * silently dropping 13% of true pairs at sf0.1; the prefix filter
  * removed the cap entirely. usage: WinnowCheck <sfDir...> */
object WinnowCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    args.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val p = graft.ext.Dedup.winnowNearDup(docs, 0.7)
      val f = graft.ext.Dedup.winnowNearDup(docs, 0.7, rolling = true)
      val pp = p.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ff = f.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // direct all-pairs reference (no prefix filter): the engine's
      // prefix path must return exactly these pairs
      val fp = docs.select(col("doc_id"),
        explode(graft.functions.Winnow(spark, col("text"), 8, 4,
          rolling = false)).as("fp"))
      val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val direct = fp.select(col("doc_id").as("doc_a"), col("fp"))
        .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
        .join(nf.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(nf.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .where(col("c").cast("double") / least(col("na"), col("nb")) >= 0.7)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val n = math.max(1, pp.size)
      println(s"[winnowcheck] $dir portable=${pp.size} fast=${ff.size} " +
        f"agreement=${(pp & ff).size.toDouble / n}%.3f " +
        s"prefixLossless=${pp == direct}")
    }
    spark.stop()
  }
}
