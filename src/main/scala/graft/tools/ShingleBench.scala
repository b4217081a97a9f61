package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the shingle pipelines in ONE JVM (alternating, median-of-3):
  * window-lead formulation vs the codegen kernel, each feeding the real
  * consumers (minhash signature aggregation; distinct shingle count).
  * shingle-bench <sfDir> <cpus> */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")

    def windowShingles(n: Int): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val tok = docs.select(col("doc_id"),
        posexplode(graft.ext.TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val parts = col("tok") +: (1 until n).map(k => lead(col("tok"), k).over(w))
      tok.select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"),
          lead(col("tok"), n - 1).over(w).isNotNull.as("__full"))
        .where(col("__full")).select("doc_id", "shingle")
    }
    def sigs(sh: DataFrame): DataFrame =
      graft.ext.Dedup.minhashSignatures(sh, 9)

    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; val s = (System.nanoTime() - t0) / 1e9
      println(f"[shingle-bench] $tag%-28s $s%6.2f s"); s
    }
    def run(df: => DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm both paths
    run(sigs(windowShingles(3))); run(sigs(graft.ext.Dedup.docShinglesRaw(docs)))
    val results = (1 to 3).flatMap { i =>
      Seq(
        "window->sigs" -> time(s"window->sigs #$i")(run(sigs(windowShingles(3)))),
        "kernel->sigs" -> time(s"kernel->sigs #$i")(run(sigs(graft.ext.Dedup.docShinglesRaw(docs)))),
        "window->distinct" -> time(s"window->distinct #$i")(run(windowShingles(3).distinct())),
        "kernel->distinct" -> time(s"kernel->distinct #$i")(run(graft.ext.Dedup.docShingles(docs))))
    }
    results.groupBy(_._1).foreach { case (k, vs) =>
      val m = vs.map(_._2).sorted.apply(vs.size / 2)
      println(f"[shingle-bench] MEDIAN $k%-20s $m%6.2f s")
    }
    spark.stop()
  }
}
