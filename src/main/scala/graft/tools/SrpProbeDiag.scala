package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does q_stream_semdedup's wall go? (VERDICT r19 #2.) Times
  * [[graft.ext.SrpIndex.build]] and one [[graft.ext.SrpIndex.searchAgainst]]
  * probe at the query's own shape (even corpus / odd batch, FeatureHash
  * 128), and attributes the probe to its internal Spark jobs — the job
  * sequence inside searchAgainst is deterministic (probe-key collect,
  * guard aggregate, candidate-id collect, then the caller's terminal
  * action runs the hamming+cosine plan), so per-job wall maps jobs to
  * stages by position. Diagnostic only.
  * Usage: SrpProbeDiag <sfDir> */
object SrpProbeDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[srpdiag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val jobLog = new java.util.concurrent.ConcurrentHashMap[
      Int, (Long, Long, String)]()
    val jl = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("-")
        jobLog.put(e.jobId, (e.time, 0L, desc))
      }
      override def onJobEnd(
          e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobLog.computeIfPresent(e.jobId, (_, v) => (v._1, e.time, v._3))
    }
    spark.sparkContext.addSparkListener(jl)
    def dumpJobs(label: String): Unit = {
      Thread.sleep(300)
      import scala.jdk.CollectionConverters.ConcurrentMapHasAsScala
      val rows = jobLog.asScala.toSeq.sortBy(_._1)
      println(s"[srpdiag] jobs during $label: n=${rows.size} " +
        rows.map { case (id, (s0, s1, d)) =>
          s"$id:${s1 - s0}ms[${d.stripPrefix("srpSearchAgainst:")}]"
        }.mkString(" "))
      jobLog.clear()
    }

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    def vecs(pred: org.apache.spark.sql.Column) =
      docs.where(pred).select(col("doc_id"),
        graft.functions.FeatureHash(spark, col("text"), 128).as("v"))
    // warm the kernels off the measured path
    graft.ext.Similarity.srpNearDup(vecs(col("doc_id") < 256), 0.6, 128).count()
    jobLog.clear()

    val path = spark.conf.get("spark.sql.warehouse.dir") + "/srp_diag_idx"
    val built = time("build")(
      graft.ext.SrpIndex.build(vecs(col("doc_id") % 2 === 0), path, dim = 128))
    dumpJobs("build")
    println(s"[srpdiag] index bits=${built.bits} bands=${built.bands} " +
      s"h=${built.bits * built.bands}")
    val idx = graft.ext.SrpIndex.load(spark, path)
    for (i <- 1 to 2) {
      val r = time(s"probe $i (searchAgainst+count)")(
        graft.ext.SrpIndex.searchAgainst(idx, vecs(col("doc_id") % 2 === 1), 0.6)
          .count())
      dumpJobs(s"probe $i")
      println(s"[srpdiag] probe $i pairs=$r")
    }
    spark.stop()
  }
}
