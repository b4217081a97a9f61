package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end SEMANTIC crawl-loop rehearsal at volume — the
  * [[CrawlRehearsal]] invariant set applied to the round-19 embedding
  * path: seeds an [[graft.ext.SrpIndex]] with the even-id half of the
  * corpus (hashing-trick embeddings), then drives the odd-id half
  * through [[graft.ext.SrpIndex.dedupAndIngest]] as a REAL multi-batch
  * stream (staged as N files, 1 file per trigger), asserting at the
  * end the same three invariants a recurring paraphrase-dedup crawl
  * needs pinned:
  *
  *  1. bounded per-cell files — no bands/bp=* or sigs/dp=* directory
  *     exceeds the compaction bound after the per-batch compactions;
  *  2. first-copy-wins — no flagged doc was appended, every survivor
  *     was, and every dup_of chain resolves to an index member through
  *     the bounded flagged-map walk (chains strictly descend within a
  *     batch, then land on a member);
  *  3. conservation — flagged + surviving == streamed doc count.
  *
  * Usage: SemCrawlRehearsal <sfDir> [nBatches] (x10 dir for the
  * rehearsal) */
object SemCrawlRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_scale/x10")
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    val t0 = System.nanoTime()

    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val idxPath = s"$wh/sem_crawl_idx"
    val stage = s"$wh/sem_crawl_stage"
    val maxFiles = 8
    val threshold = 0.6

    def vecsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        graft.functions.FeatureHash(df.sparkSession, col("text"), 128).as("v"))

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val seed = docs.where(col("doc_id") % 2 === 0)
    val streamed = docs.where(col("doc_id") % 2 === 1)
    val nStreamed = streamed.count()
    graft.ext.SrpIndex.build(vecsOf(seed), idxPath, dim = 128)
    val idx = graft.ext.SrpIndex.load(spark, idxPath)
    println(s"[semcrawl] seed=${seed.count()} streamed=$nStreamed " +
      s"batches=$nBatches bits=${idx.bits} bands=${idx.bands}")

    streamed.repartition(nBatches)
      .write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val flagged = graft.ext.SrpIndex
      .dedupAndIngest(vecsOf(arrivals), idx, threshold, maxFiles)
    val nFlagged = flagged.count()
    val flaggedIds = flagged.select("doc_id").distinct()
    val nFlaggedIds = flaggedIds.count()

    // 1. bounded per-cell files after the crawl's per-batch compaction
    val hconf = spark.sparkContext.hadoopConfiguration
    var maxSeen = 0
    Seq("bands", "sigs").foreach { sub =>
      val root = new org.apache.hadoop.fs.Path(s"$idxPath/$sub")
      val fs = root.getFileSystem(hconf)
      fs.listStatus(root).filter(_.isDirectory).foreach { d =>
        val n = fs.listStatus(d.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        maxSeen = math.max(maxSeen, n)
        require(n <= maxFiles,
          s"[semcrawl] cell ${d.getPath} holds $n files > bound $maxFiles")
      }
    }
    println(s"[semcrawl] per-cell file bound OK (max seen $maxSeen <= $maxFiles)")

    // 2. first-copy-wins membership invariants
    val members = spark.read.parquet(s"$idxPath/sigs").select("doc_id")
    val flaggedMembers = flaggedIds.join(members, Seq("doc_id")).count()
    require(flaggedMembers == 0,
      s"[semcrawl] $flaggedMembers flagged docs were appended to the index")
    val survivors = streamed.select("doc_id")
      .join(flaggedIds, Seq("doc_id"), "left_anti")
    val missing = survivors.join(members, Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"[semcrawl] $missing surviving docs missing from the index")
    val nonMemberTargets = flagged.select(col("dup_of").as("doc_id"))
      .distinct().join(members, Seq("doc_id"), "left_anti")
    val dangling = nonMemberTargets
      .join(flaggedIds, Seq("doc_id"), "left_anti").count()
    require(dangling == 0,
      s"[semcrawl] $dangling dup_of targets neither members nor flagged")
    val chainMap = flagged
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val memberSet = members.collect().map(_.getLong(0)).toSet
    val chainStarts = nonMemberTargets.collect().map(_.getLong(0))
    chainStarts.foreach { start =>
      var cur = start
      var steps = 0
      while (!memberSet.contains(cur)) {
        require(chainMap.contains(cur),
          s"[semcrawl] chain from $start dangles at $cur")
        cur = chainMap(cur)
        steps += 1
        require(steps <= chainMap.size,
          s"[semcrawl] chain from $start did not terminate (cycle?)")
      }
    }
    println(s"[semcrawl] first-copy-wins membership OK (chained targets: " +
      chainStarts.length + ")")

    // 3. conservation
    val nSurvivors = survivors.count()
    require(nFlaggedIds + nSurvivors == nStreamed,
      s"[semcrawl] flagged $nFlaggedIds + surviving $nSurvivors != $nStreamed")
    println(f"[semcrawl] conservation OK: flagged=$nFlaggedIds " +
      f"survivors=$nSurvivors pairs=$nFlagged " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
