package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, DedupIndex, MixOps, PipelineOps, SpanDedup}

/** Full crawl-to-corpus rehearsal (round-17 verdict #6): chains every
  * DEPLOYMENT form end-to-end as ONE stream — each arriving microbatch
  * flows hygiene-on-ingest (frozen profile) → near-dup probe+grow
  * against the persisted band index → span-dedup against the frozen
  * gram index → training-shard write — and the run ends by asserting
  * the invariants each stage promises individually:
  *
  *  1. disposition conservation — every arrival lands in EXACTLY one of
  *     {hygiene_drop, neardup_flag, kept}; counts sum to the arrival
  *     count and no doc_id appears twice;
  *  2. batching-invariance of the frozen stages — the streamed hygiene
  *     survivor set (doc_id set; the disposition rows don't carry the
  *     hygiene evidence columns) and the streamed span stats of kept
  *     docs (full columns: total/dup tokens + clean_fp) equal a single
  *     batch run of the same functions over the same inputs (the per-stage parity the
  *     q_stream_pipeline / q_stream_span_dedup oracles pin, re-checked
  *     here on the chained composition);
  *  3. first-copy-wins for the growing index — no flagged doc was
  *     appended, every kept doc is a member, and every dup_of chain
  *     resolves to a member ([[CrawlRehearsal]]'s walk, unchanged
  *     semantics inside the larger composition);
  *  4. bounded per-cell index files under the per-batch compaction;
  *  5. shard-write integrity — the shard directories hold exactly the
  *     kept docs, once each, with the DETERMINISTIC md5 assignment (a
  *     batch re-run of [[MixOps.shardAssign]] over the re-read corpus
  *     reproduces every stored shard value).
  *
  * Near-dup flags keep their documented order-dependence (first copy
  * seen wins); invariant 3 is exactly the order-independent part.
  *
  * Usage: CorpusRehearsal <sfDir> [nBatches] [nShards]
  */
object CorpusRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/bench_scale/x10")
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val nShards = if (args.length > 2) args(2).toInt else 8
    val threshold = 0.7
    val maxFiles = 8
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
    val idxPath = s"$wh/corpus_rehearsal_idx"
    val gramPath = s"$wh/corpus_rehearsal_grams"
    val shardPath = s"$wh/corpus_rehearsal_shards"
    val stage = s"$wh/corpus_rehearsal_stage"

    // the shard write APPENDS per microbatch — a prior run's directory
    // must not leak into this run's integrity counts
    Seq(idxPath, gramPath, shardPath, stage).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(hp, true)
    }

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val seed = docs.where(col("doc_id") % 2 === 0)
    val arrivals = docs.where(col("doc_id") % 2 === 1)
    val nArrivals = arrivals.count()

    // ---- frozen corpus artifacts, built once from the seed half ----
    val profile = PipelineOps.buildHygieneProfile(seed, col("doc_id") % 50 === 0)
    DedupIndex.build(seed, idxPath)
    val idx = DedupIndex.load(spark, idxPath)
    SpanDedup.saveGramIndex(SpanDedup.buildGramIndex(seed), gramPath)
    val gidx = SpanDedup.loadGramIndex(spark, gramPath)
    println(s"[corpus] seed=${seed.count()} arrivals=$nArrivals " +
      s"batches=$nBatches shards=$nShards")

    // stage the arrival half as nBatches files; 1 file per trigger
    arrivals.repartition(nBatches).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)

    // ---- ONE stream: the whole corpus build per microbatch ----
    val dispositions = graft.streaming.StreamingOps.runBatchesToParquet(
      streamed, "corpus_rehearsal",
      batch => {
        val scored = PipelineOps.hygieneScore(profile, batch)
        val keptDocs = batch
          .join(scored.select("doc_id"), Seq("doc_id"), "left_semi")
        // near-dup: probe the growing index + intra-batch pairs, the
        // dedupAndIngest per-batch recipe with hygiene upstream of it
        val vsCorpus = DedupIndex.searchAgainst(idx, keptDocs, threshold)
        val intra = Dedup.minhashNearDup(keptDocs, threshold,
            idx.bands, idx.rowsPerBand, idx.n)
          .select(col("doc_b").as("doc_id"), col("doc_a").as("dup_of"),
            col("jaccard"))
        val dups = graft.ext.Lineage.cut(vsCorpus.unionByName(intra)
          .groupBy("doc_id")
          .agg(min(struct(col("dup_of"), col("jaccard"))).as("m"))
          .select(col("doc_id"), col("m.dup_of").as("dup_of"),
            col("m.jaccard").as("jaccard")))
        val fresh = keptDocs.join(dups.select("doc_id"), Seq("doc_id"), "left_anti")
        DedupIndex.append(fresh, idx)
        DedupIndex.compact(idxPath, maxFiles)
        // span-score the survivors against the frozen gram index
        val spans = SpanDedup.spanDedupAgainst(gidx, fresh)
        // training-shard write: deterministic md5 assignment, appended
        // under shard=K directories (the writeShards layout, streamed)
        val sharded = fresh.select("doc_id", "text")
          .join(MixOps.shardAssign(fresh, nShards).select("doc_id", "shard"),
            Seq("doc_id"))
        sharded.repartition(col("shard"))
          .sortWithinPartitions("shard", "doc_id")
          .write.mode("append").partitionBy("shard").parquet(shardPath)
        // one disposition row per arriving doc
        val dropped = batch.select("doc_id")
          .join(scored.select("doc_id"), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), lit("hygiene_drop").as("status"),
            lit(null).cast("long").as("dup_of"),
            lit(null).cast("double").as("jaccard"),
            lit(null).cast("long").as("total_tokens"),
            lit(null).cast("long").as("dup_tokens"),
            lit(null).cast("string").as("clean_fp"))
        val flagged = dups
          .select(col("doc_id"), lit("neardup_flag").as("status"),
            col("dup_of"), col("jaccard"),
            lit(null).cast("long").as("total_tokens"),
            lit(null).cast("long").as("dup_tokens"),
            lit(null).cast("string").as("clean_fp"))
        val kept = spans
          .select(col("doc_id"), lit("kept").as("status"),
            lit(null).cast("long").as("dup_of"),
            lit(null).cast("double").as("jaccard"),
            col("total_tokens"), col("dup_tokens"), col("clean_fp"))
        dropped.unionByName(flagged).unionByName(kept)
      })
    dispositions.persist()

    // ---- 1. disposition conservation ----
    val byStatus = dispositions.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byStatus.values.sum
    val distinctIds = dispositions.select("doc_id").distinct().count()
    require(total == nArrivals && distinctIds == nArrivals,
      s"[corpus] dispositions $byStatus (sum $total, distinct $distinctIds)" +
        s" != arrivals $nArrivals")
    println(s"[corpus] conservation OK: $byStatus")

    // ---- 2. batching-invariance of the frozen stages ----
    val batchHygiene = PipelineOps.hygieneScore(profile, arrivals)
    val streamHygieneIds = dispositions.where(col("status") =!= "hygiene_drop")
      .select("doc_id")
    val hygieneDiff =
      batchHygiene.select("doc_id").except(streamHygieneIds).count() +
        streamHygieneIds.except(batchHygiene.select("doc_id")).count()
    require(hygieneDiff == 0,
      s"[corpus] hygiene survivors differ stream-vs-batch by $hygieneDiff ids")
    val keptDocsAll = arrivals.join(
      dispositions.where(col("status") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")
    val batchSpans = SpanDedup.spanDedupAgainst(gidx, keptDocsAll)
      .select("doc_id", "total_tokens", "n_spans", "dup_tokens", "clean_fp")
    val streamSpans = dispositions.where(col("status") === "kept")
      .select("doc_id", "total_tokens", "dup_tokens", "clean_fp")
    val spanDiff =
      batchSpans.select("doc_id", "total_tokens", "dup_tokens", "clean_fp")
        .except(streamSpans).count() +
        streamSpans.except(
          batchSpans.select("doc_id", "total_tokens", "dup_tokens", "clean_fp"))
          .count()
    require(spanDiff == 0,
      s"[corpus] span stats differ stream-vs-batch on $spanDiff rows")
    println("[corpus] frozen-stage batching-invariance OK " +
      s"(hygiene ids + span stats over ${byStatus("kept")} kept docs)")

    // ---- 3. first-copy-wins on the growing index ----
    val members = spark.read.parquet(s"$idxPath/sets").select("doc_id")
    val flaggedIds = dispositions.where(col("status") === "neardup_flag")
      .select("doc_id").distinct()
    require(flaggedIds.join(members, Seq("doc_id")).count() == 0,
      "[corpus] flagged docs were appended to the index")
    val keptIds = dispositions.where(col("status") === "kept").select("doc_id")
    require(keptIds.join(members, Seq("doc_id"), "left_anti").count() == 0,
      "[corpus] kept docs missing from the index")
    val flaggedRows = dispositions.where(col("status") === "neardup_flag")
    val nonMemberTargets = flaggedRows.select(col("dup_of").as("doc_id"))
      .distinct().join(members, Seq("doc_id"), "left_anti")
    require(nonMemberTargets
        .join(flaggedIds, Seq("doc_id"), "left_anti").count() == 0,
      "[corpus] dup_of targets neither members nor flagged")
    val chainMap = flaggedRows.groupBy("doc_id")
      .agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val memberSet = members.collect().map(_.getLong(0)).toSet
    nonMemberTargets.collect().map(_.getLong(0)).foreach { start =>
      var cur = start
      var steps = 0
      while (!memberSet.contains(cur)) {
        require(chainMap.contains(cur), s"[corpus] chain dangles at $cur")
        cur = chainMap(cur)
        steps += 1
        require(steps <= chainMap.size, s"[corpus] chain cycle from $start")
      }
    }
    println("[corpus] first-copy-wins membership OK")

    // ---- 4. bounded per-cell index files ----
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
          s"[corpus] cell ${d.getPath} holds $n files > bound $maxFiles")
      }
    }
    println(s"[corpus] per-cell file bound OK (max seen $maxSeen <= $maxFiles)")

    // ---- 5. shard-write integrity + deterministic assignment ----
    val shards = spark.read.parquet(shardPath)
    val nShardRows = shards.count()
    val nKept = byStatus.getOrElse("kept", 0L)
    require(nShardRows == nKept,
      s"[corpus] shard rows $nShardRows != kept $nKept")
    require(shards.select("doc_id").distinct().count() == nKept,
      "[corpus] a kept doc appears in more than one shard row")
    require(shards.select("doc_id").except(keptIds).count() == 0,
      "[corpus] shard dirs contain non-kept docs")
    val reassigned = MixOps.shardAssign(shards, nShards)
      .select(col("doc_id"), col("shard").as("shard2"))
    val moved = shards.select(col("doc_id"), col("shard"))
      .join(reassigned, Seq("doc_id"))
      .where(col("shard") =!= col("shard2")).count()
    require(moved == 0,
      s"[corpus] $moved docs change shard on a deterministic re-assign")
    // partitionBy columns read back as int — cast before the typed collect
    val shardVals = shards.select(col("shard").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    require(shardVals.forall(s => s >= 0 && s < nShards),
      s"[corpus] shard values out of range: ${shardVals.mkString(",")}")
    println(s"[corpus] shard write OK: $nShardRows rows across " +
      s"${shardVals.length} shards")

    dispositions.unpersist()
    profile.release()
    gidx.release()
    println(f"[corpus] rehearsal OK: arrivals=$nArrivals " +
      f"dropped=${byStatus.getOrElse("hygiene_drop", 0L)} " +
      f"flagged=${byStatus.getOrElse("neardup_flag", 0L)} kept=$nKept " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
