package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end crawl-loop rehearsal at volume (round-13 verdict #8):
  * seeds a DedupIndex with the even-id half of the corpus, then drives
  * the odd-id half through [[graft.ext.DedupIndex.dedupAndIngest]] as a
  * REAL multi-batch stream (the staged odd half is written as N files
  * and the file source is rate-limited to 1 file per trigger, so the
  * drain replays a crawl of N arrivals), asserting at the end:
  *
  *  1. bounded per-cell files — no bands/bp=* or sets/dp=* directory
  *     holds more parquet files than the compaction bound;
  *  2. first-copy-wins — no flagged doc_id was appended to the index,
  *     every survivor (non-flagged streamed doc) was, and every dup_of
  *     chain RESOLVES to an index member: a dup_of is either a member
  *     (seed or earlier-arrived survivor) or itself a flagged doc whose
  *     own dup_of chains onward — B~A intra-batch while A~corpus flags
  *     B against A and A against the corpus, so B's evidence is a
  *     two-step chain, which is the documented first-copy-wins shape
  *     (chains strictly descend within a batch's ids, then land on a
  *     member, so resolution always terminates);
  *  3. conservation — flagged + surviving == streamed doc count.
  *
  * Usage: CrawlRehearsal <sfDir> [nBatches] (x10 dir for the rehearsal)
  */
object CrawlRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_scale/x10")
    val nBatches = if (args.length > 1) args(1).toInt else 20
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

    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val idxPath = s"$wh/crawl_rehearsal_idx"
    val stage = s"$wh/crawl_rehearsal_stage"
    val maxFiles = 8

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val seed = docs.where(col("doc_id") % 2 === 0)
    val streamed = docs.where(col("doc_id") % 2 === 1)
    val nStreamed = streamed.count()
    graft.ext.DedupIndex.build(seed, idxPath)
    val idx = graft.ext.DedupIndex.load(spark, idxPath)
    println(s"[crawl] seed=${seed.count()} streamed=$nStreamed " +
      s"batches=$nBatches")

    // stage the arriving half as nBatches files; 1 file per trigger
    streamed.repartition(nBatches)
      .write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val arrivals = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val flagged = graft.ext.DedupIndex
      .dedupAndIngest(arrivals, idx, 0.7, maxFiles)
    val nFlagged = flagged.count()
    val flaggedIds = flagged.select("doc_id").distinct()
    val nFlaggedIds = flaggedIds.count()

    // 1. bounded per-cell files after the crawl's per-batch compaction
    val hconf = spark.sparkContext.hadoopConfiguration
    var maxSeen = 0
    Seq("bands", "sets").foreach { sub =>
      val root = new org.apache.hadoop.fs.Path(s"$idxPath/$sub")
      val fs = root.getFileSystem(hconf)
      fs.listStatus(root).filter(_.isDirectory).foreach { d =>
        val n = fs.listStatus(d.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        maxSeen = math.max(maxSeen, n)
        require(n <= maxFiles,
          s"[crawl] cell ${d.getPath} holds $n files > bound $maxFiles")
      }
    }
    println(s"[crawl] per-cell file bound OK (max seen $maxSeen <= $maxFiles)")

    // 2. first-copy-wins membership invariants
    val members = spark.read.parquet(s"$idxPath/sets").select("doc_id")
    val flaggedMembers = flaggedIds.join(members, Seq("doc_id")).count()
    require(flaggedMembers == 0,
      s"[crawl] $flaggedMembers flagged docs were appended to the index")
    val survivors = streamed.select("doc_id")
      .join(flaggedIds, Seq("doc_id"), "left_anti")
    val missing = survivors.join(members, Seq("doc_id"), "left_anti").count()
    require(missing == 0,
      s"[crawl] $missing surviving docs missing from the index")
    // dup_of chain resolution: non-member targets must be flagged docs
    // (chain onward), and following flagged->dup_of links from every
    // non-member target must reach a member (bounded driver walk over
    // the flagged map — small by construction)
    val nonMemberTargets = flagged.select(col("dup_of").as("doc_id"))
      .distinct().join(members, Seq("doc_id"), "left_anti")
    val dangling = nonMemberTargets
      .join(flaggedIds, Seq("doc_id"), "left_anti").count()
    require(dangling == 0,
      s"[crawl] $dangling dup_of targets neither members nor flagged")
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
          s"[crawl] chain from $start dangles at $cur")
        cur = chainMap(cur)
        steps += 1
        require(steps <= chainMap.size,
          s"[crawl] chain from $start did not terminate (cycle?)")
      }
    }
    println(s"[crawl] first-copy-wins membership OK (chained targets: " +
      chainStarts.length + ")")

    // 3. conservation
    val nSurvivors = survivors.count()
    require(nFlaggedIds + nSurvivors == nStreamed,
      s"[crawl] flagged $nFlaggedIds + surviving $nSurvivors != $nStreamed")
    println(f"[crawl] conservation OK: flagged=$nFlaggedIds " +
      f"survivors=$nSurvivors pairs=$nFlagged " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
