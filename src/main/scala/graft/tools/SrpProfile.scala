package graft.tools

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the SRP-LSH near-dup pipeline (q_hash_embed_
  * neardup) — isolates feature hashing, projection+banding, the candidate
  * join, and verification. `usage: SrpProfile <sfDir>` */
object SrpProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.prepare(spark)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[srp] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, dir, "documents")
    t("load+count")(docs.count())
    val vecs = docs.select(col("doc_id"),
      graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
    t("featureHash count")(vecs.count())
    t("featureHash collect")(vecs.collect())
    val withNorm = vecs
      .withColumn("nrm", sqrt(graft.functions.VectorExpressions.dot(
        spark, col("v"), col("v"))))
      .where(col("nrm") > 0)
    t("norm collect")(withNorm.select("doc_id", "nrm").collect())
    withNorm.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("withNorm cache")(withNorm.count())

    val bits = sys.env.getOrElse("SRP_BITS", "8").toInt
    val bands = sys.env.getOrElse("SRP_BANDS", "32").toInt
    val h = bits * bands; val dim = 128
    val rnd = new java.util.Random(42L)
    val flat = Array.fill(h * dim)(rnd.nextGaussian())
    val bandRows = withNorm
      .withColumn("bb", graft.functions.VectorExpressions.signBands(
        spark,
        graft.functions.VectorExpressions.matVecConst(spark, flat, col("v"), h),
        bits, bands))
      .select(col("doc_id"), posexplode(col("bb")).as(Seq("band", "bval")))
    val bbOnly = withNorm
      .withColumn("bb", graft.functions.VectorExpressions.signBands(
        spark,
        graft.functions.VectorExpressions.matVecConst(spark, flat, col("v"), h),
        bits, bands))
      .select(col("doc_id"), col("bb"))
    t("bb no-explode count")(bbOnly.count())
    t("bb no-explode count again")(bbOnly.count())
    t("bandRows count")(bandRows.count())
    t("bandRows count again")(bandRows.count())
    println(bandRows.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))

    val l = bandRows.select(col("doc_id").as("doc_a"), col("band"), col("bval"))
    val r = bandRows.select(col("doc_id").as("doc_b"), col("band"), col("bval"))
    val cand = l.join(r, Seq("band", "bval"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    t("candidates count")(println("  candidates=" + cand.count()))

    // replicate srpNearDup internals with per-step timing
    val prepped = t("prepped persist+count") {
      val p = withNorm.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count(); p
    }
    val cand2 = t("candidates persist+count") {
      val c = cand.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    t("cand2 count again")(cand2.count())
    val candIds = cand2.select(col("doc_a").as("doc_id"))
      .union(cand2.select(col("doc_b").as("doc_id"))).distinct()
    t("candIds count")(candIds.count())
    t("candIds count again")(candIds.count())
    val vv = prepped.join(broadcast(candIds), Seq("doc_id"), "left_semi")
    t("vv count")(vv.count())
    val out = cand2
      .join(vv.select(col("doc_id").as("doc_a"), col("v").as("va"), col("nrm").as("na")), "doc_a")
      .join(vv.select(col("doc_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (graft.functions.VectorExpressions.dot(spark, col("va"), col("vb")) /
          (col("na") * col("nb"))).as("cos"))
      .where(col("cos") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("cos"), 6).as("sim"))
    t("verify count")(out.count())
    t("lineage cut")(graft.ext.Lineage.cut(out).count())

    t("full srpNearDup")(
      Similarity.srpNearDup(
        docs.select(col("doc_id"),
          graft.functions.FeatureHash(spark, col("text"), 128).as("v")),
        threshold = 0.6, dim = 128).count())
    spark.stop()
  }
}
