package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drills into the SRP candidate-join cost that SrpProfile surfaced:
  * bucket-size skew of the (band, bval) self-join, join input/output
  * volumes, and where the wall-clock goes at the REAL auto-sized
  * bits/bands (SrpProfile's fixed 8x32 underestimates h).
  *
  * Round-16 findings (sf0.1, this box): NO skew (top bucket 14 docs,
  * sum(cnt^2) = 821k), srpHyperplanes costs 0.06 s driver-side — the
  * round-15 md5-plane switch is NOT where q_hash_embed_neardup's wall
  * went; the row is stage-count floor (~10 small-data shuffle stages at
  * ~0.3-0.5 s each). Variant B below (distinct AFTER hamming + direct
  * AQE joins replacing the candIds broadcast semi-join) measured 5.2-6.2
  * s for the TAIL ALONE vs 4.1-4.6 s for the whole current operator —
  * the current shape (distinct early, hamming on compact sigs, explicit
  * broadcast of the tiny candidate-id set) wins and stays; B is kept
  * here as the measured record of the rejected restructure.
  * usage: SrpJoinProbe <sfDir> */
object SrpJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, dir, "documents")
    val vecs = docs.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
    val prepped = vecs.repartition(32)
      .withColumn("nrm", sqrt(graft.functions.VectorExpressions.dot(
        spark, col("v"), col("v"))))
      .where(col("nrm") > 0)
      .persist()
    val n = t("prep+count")(prepped.count())
    val bits = graft.ext.Similarity.srpAutoBits(n)
    val bands = graft.ext.Similarity.srpAutoBands(bits)
    val h = bits * bands
    println(s"[probe] n=$n bits=$bits bands=$bands h=$h")
    val t0 = System.nanoTime()
    val flat = graft.ext.Similarity.srpHyperplanes(h, 128)
    println(f"[probe] srpHyperplanes driver-side                 ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val sigs = prepped
      .withColumn("__proj", graft.functions.VectorExpressions.matVecConst(
        spark, flat, col("v"), h))
      .select(col("doc_id"),
        graft.functions.VectorExpressions.signBands(
          spark, col("__proj"), bits, bands).as("bb"),
        graft.functions.VectorExpressions.packSigns(
          spark, col("__proj")).as("sig"))
      .persist()
    t("sigs materialize (matvec+bands+pack)")(sigs.count())
    t("sigs count again (cached)")(sigs.count())

    val bandRows = sigs.select(col("doc_id"), posexplode(col("bb")).as(Seq("band", "bval")))
    t("bandRows count")(bandRows.count())

    // bucket skew: the join's work is sum(cnt^2) over buckets
    val buckets = bandRows.groupBy("band", "bval").count().persist()
    t("bucket histogram")(buckets.count())
    val top = buckets.orderBy(desc("count")).limit(10).collect()
    println("[probe] top buckets: " + top.map(_.getLong(2)).mkString(","))
    val work = buckets.agg(sum(col("count") * col("count"))).first().getLong(0)
    println(s"[probe] sum(cnt^2) join work = $work")

    val l = bandRows.select(col("doc_id").as("doc_a"), col("band"), col("bval"))
    val r = bandRows.select(col("doc_id").as("doc_b"), col("band"), col("bval"))
    val joined = l.join(r, Seq("band", "bval")).where(col("doc_a") < col("doc_b"))
    t("join (pre-distinct) count")(println("  matches=" + joined.count()))
    t("join again")(joined.count())
    val cand = joined.select("doc_a", "doc_b").distinct()
    t("distinct count")(println("  candidates=" + cand.count()))
    t("distinct again")(cand.count())

    // end-to-end A/B: current operator vs restructured tail
    def endToEnd(label: String)(body: => Long): Unit =
      (1 to 3).foreach { i => t(s"$label #$i")(println("  pairs=" + body)) }

    endToEnd("A current srpNearDup") {
      graft.ext.Similarity.srpNearDup(vecs, threshold = 0.6, dim = 128).count()
    }

    endToEnd("B restructured tail") {
      val hamMax = graft.ext.Similarity.srpHamMax(h, 0.6, 3.0)
      val candB = joined.select("doc_a", "doc_b") // no distinct here
      val surv = candB
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sa")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sb")), "doc_b")
        .where(graft.functions.VectorExpressions.hamming(
          spark, col("sa"), col("sb")) <= hamMax)
        .select("doc_a", "doc_b").distinct()
        .persist()
      surv.count()
      val out = surv
        .join(prepped.select(col("doc_id").as("doc_a"), col("v").as("va"), col("nrm").as("na")), "doc_a")
        .join(prepped.select(col("doc_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (graft.functions.VectorExpressions.dot(spark, col("va"), col("vb")) /
            (col("na") * col("nb"))).as("cos"))
        .where(col("cos") >= 0.6)
      val nOut = out.count()
      surv.unpersist()
      nOut
    }
    spark.stop()
  }
}
