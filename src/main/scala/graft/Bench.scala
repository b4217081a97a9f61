package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is forced through a `noop` sink — a bare count() would let
  * Catalyst prune the very projections being measured (e.g. all of
  * q_quality's regex work folds away under count(*)). A small untimed
  * warm-up first: JVM/codegen/parquet-reader init otherwise lands on
  * whichever query happens to run first.
  */
object Bench {

  /** (1m, 5m, 15m) from /proc/loadavg — NaNs on non-Linux. */
  private def loadavg(): (Double, Double, Double) =
    try {
      val parts = scala.io.Source.fromFile("/proc/loadavg").mkString
        .trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble)
    } catch { case scala.util.control.NonFatal(_) =>
      (Double.NaN, Double.NaN, Double.NaN) }

  /** (stealJiffies, totalJiffies) from /proc/stat's aggregate cpu line;
    * deltas across the run give steal%% — nonzero only when a noisy
    * co-tenant VM takes the pCPU (the BASELINE.md 185-vs-238 s weather
    * signature). Total sums only the first 8 columns (user..steal):
    * guest/guest_nice are already folded into user/nice by the kernel,
    * so including them would double-count on guest-running hosts and
    * understate steal%%. */
  private def cpuJiffies(): (Long, Long) =
    try {
      val cols = scala.io.Source.fromFile("/proc/stat").getLines()
        .next().trim.split("\\s+").drop(1).map(_.toLong)
      (if (cols.length > 7) cols(7) else 0L, cols.take(8).sum)
    } catch { case scala.util.control.NonFatal(_) => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle partitions default to the core count (the sf0.1/x10
    // protocol), overridable for larger amplifications (the 100 TB
    // practice sizes partitions to the data, not the core count; at
    // x100 both settings measured within noise of each other —
    // q_minhash_margin is compute-bound, not spill-bound, there)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up steps are individually fenced: a broken table or feature
    // must cost at most one cold first query, never the whole bench run
    // (round 9 lost every timing to one AnalysisException here).
    def warm(step: String)(body: => Unit): Unit =
      try body catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warm-up '$step' failed: ${e.getMessage}")
      }

    graft.sources.Tables.prepare(spark)
    warm("lineitem") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
    }
    warm("events")(graft.sources.Tables.events(spark, sfDir).limit(10).collect())
    // touch every other input once so parquet footer reads + reader init
    // land in the warm-up, not on whichever query reads the table first
    Seq("documents", "embeddings", "orders", "customer", "nation", "region",
      "supplier", "part")
      .foreach(t => warm(t)(graft.sources.Tables.load(spark, sfDir, t).count()))
    // warm the hot codegen/JIT paths on tiny slices: the tokenizer
    // regex + shingle window, md5/xxhash hashing, and the graft_dot
    // expression otherwise all land on the alphabetically-first query
    // that uses them (measured: +5s on q_dup_clusters, cold vs warm)
    locally {
      import org.apache.spark.sql.functions._
      def d64 = graft.sources.Tables.load(spark, sfDir, "documents").limit(64)
      warm("shingle-hash") {
        graft.ext.Dedup.docShingles(d64)
          .select(md5(col("shingle")), xxhash64(col("shingle"))).count()
      }
      warm("vec-dot") {
        val e64 = graft.sources.Tables.load(spark, sfDir, "embeddings").limit(64)
        val v = col("embedding").cast("array<double>")
        e64.select(graft.ext.Similarity.dot(v, v)).count()
      }
      // array-kernel codegen (sort_array/array_intersect/transform) used by
      // the prefix-containment verifier — ~3 s of JIT cold
      warm("array-kernels") {
        d64.groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("text")))).as("s"))
          .select(size(array_intersect(
            expr("transform(s, x -> x.text)"),
            expr("transform(slice(s, 1, 1), x -> x.text)"))))
          .count()
      }
      // the full MinHash-LSH pipeline (signature min-aggs, band-struct
      // explode, bucket self-join, verify) JITs ~3 s on first use, which
      // otherwise lands on the alphabetically-first LSH consumer
      // (measured: q_dup_clusters 5.7 s cold vs 2.5 s warm)
      warm("minhash")(graft.ext.Dedup.minhashNearDup(d64, 0.7).count())
      // winnowing fingerprints (md5 + rolling Karp-Rabin kernels, the
      // rarest-first prefix filter and the sorted-merge overlap verify)
      // JIT on first use. Like srp-lsh below, 64 rows leaves the shared
      // fingerprint-kernel statics in the interpreter for the first real
      // query (r10 driver run: q_winnow_fast 14.5 s vs 5.6 s min-of-3 at
      // the same scale) — a 512-row slice gives them enough invocations
      // to tier up to C2 before the timed region.
      warm("winnow") {
        val d512w = graft.sources.Tables.load(spark, sfDir, "documents")
          .limit(512)
        graft.ext.Dedup.winnowNearDup(d512w, 0.7).count()
        graft.ext.Dedup.winnowRecallGate(d512w, 0.7).count()
      }
      // the prefix-containment path (index build: df-count + rarest-first
      // sort_array sets, prefix slice join, array_intersect verify) JITs
      // ~5 s on first use (measured: q_containment 8.3 s cold vs 3.1 s
      // warm at sf0.1)
      warm("containment")(
        graft.ext.PipelineOps.containmentPairsPrefix(d64, 0.8).count())
      // the SRP-LSH pipeline (feature-hash embed, matvec/sign-band
      // kernels, band self-join, cosine verify, lineage cut) JITs ~25 s
      // of generated classes + kernel statics on first use (measured:
      // q_hash_embed_neardup 36.6 s cold vs 9.0 s warm at sf0.1). A
      // 512-row slice at the production band shape gives the shared
      // VectorKernels statics enough invocations to tier up to C2 —
      // 64 rows leaves them in the interpreter for the first real query.
      warm("srp-lsh") {
        val d512 = graft.sources.Tables.load(spark, sfDir, "documents")
          .limit(512)
        graft.ext.Similarity.srpNearDup(
          d512.select(col("doc_id"),
            graft.functions.FeatureHash(spark, col("text"), 128).as("v")),
          threshold = 0.6, dim = 128, bits = 8, bands = 32).count()
      }
      // IVF assignment/probe kernels at REALISTIC scaled k: the official
      // single-run bench measured q_ivf_multiprobe 6.6 s and
      // q_ivf_kmeans 5.8 s vs 1.2/0.8 s min-of-two at identical config —
      // a C2 recompile of the flat-matrix cell kernels landing inside
      // the timed region. Warm the exact kernels (graft_ivf_cell/cells),
      // the cell-join + per-qid window, and the driver Lloyd's loop at
      // the SAME k the real queries use (k depends only on corpus size,
      // so this matches production shape, not toy k).
      warm("ivf") {
        val embAll = graft.sources.Tables.load(spark, sfDir, "embeddings")
        val kCells = graft.ext.IvfKMeans.scaledK(embAll.count())
        val e2k = embAll.select("vec_id", "embedding").limit(2048)
        val cents = graft.ext.IvfKMeans.trainCentroids(
          e2k, kCells, sampleN = math.max(2048, 16 * kCells))
        graft.ext.Similarity.multiProbeNN(
          e2k, cents, nprobe = 4, k = 5,
          probeFilter = col("vec_id") < 10).count()
        graft.ext.Similarity.bucketedNN(
          graft.ext.IvfKMeans.assignCells(e2k, cents), "cell", k = 5).count()
      }
      // partitioned parquet WRITE path (committer init, codec, task
      // commit protocol): the streaming drains no longer write parquet,
      // so the suite's first real write otherwise lands on
      // q_dedup_against's index build
      warm("parquet-write") {
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val dir = s"$wh/graft_warm_write"
        spark.range(64).withColumn("p", col("id") % 4)
          .write.mode("overwrite").partitionBy("p").parquet(dir)
        val hp = new org.apache.hadoop.fs.Path(dir)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) { fs.delete(hp, true); () }
      }
      // repetition-stats and char-trigram kernels (plus the trigram
      // model-build agg) JIT on first use like the shingle family
      warm("text-kernels") {
        d64.select(graft.functions.TextKernels
          .repetitionStatsCol(spark, col("text"))).count()
        graft.ext.TextOps.trigramRareRate(d64, 2000L).count()
      }
      // stopword-alternation regex counting (langid/quality) compiles its
      // own regex + codegen path (measured: q_langid 2.1 s cold vs 0.4 s
      // warm when another query got there first)
      warm("langid") {
        graft.ext.TextOps.LangStopwords.foldLeft(d64) { case (df, (l, pat)) =>
          df.withColumn(s"s_$l", graft.ext.TextOps.matchCount(col("text"), pat))
        }.count()
      }
      // streaming machinery (file stream source, microbatch planner,
      // streaming-agg state store, foreachBatch) JITs on first use —
      // ~3 s that otherwise lands on the alphabetically-first q_stream_*
      // query. Drain a tiny real streaming aggregation untimed.
      warm("streaming") {
        val warmStream = graft.sources.Tables.eventsStream(spark, sfDir)
          .where(col("event_id") < 100)
        val wq = graft.streaming.StreamingOps.runningAggregate(
            warmStream, "ts", "0 seconds", Seq("user_id"),
            Seq(count(lit(1)).as("n")))
          .writeStream.outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            b.count(); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        wq.awaitTermination()
      }
      // session-window streaming aggregation + the parquet streaming sink:
      // a DIFFERENT physical operator and state-store schema than the
      // running aggregate above, plus runToParquet's per-batch append +
      // bounded re-read — both land on q_stream_sessions/q_stream_pipeline
      // otherwise (r10 driver run: 2-2.5x their min-of-3)
      warm("streaming-session") {
        val warmStream = graft.sources.Tables.eventsStream(spark, sfDir)
          .where(col("event_id") < 100)
        graft.streaming.StreamingOps.runToParquet(
          graft.streaming.StreamingOps.sessionized(
            warmStream, "ts", "0 seconds", "30 minutes",
            Seq("user_id"), Seq(count(lit(1)).as("n"))),
          "warm_sessions").count()
      }
      // documents FILE stream source (q_stream_pipeline's input): file
      // manifest/listing + schema-pinned reader init are per-source-path
      warm("streaming-docs") {
        val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
        val ds = spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
          .where(col("doc_id") < 8)
        graft.streaming.StreamingOps.runToParquet(ds, "warm_docs").count()
      }
      // transformWithState machinery under the RocksDB provider (JNI
      // library load + column-family init) used by q_stream_funnel /
      // q_stream_flagship / q_stream_asof
      warm("streaming-rocksdb") {
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val prev = spark.conf.getOption(provKey)
        spark.conf.set(provKey, "org.apache.spark.sql.execution.streaming" +
          ".state.RocksDBStateStoreProvider")
        try {
          val warmStream = graft.sources.Tables.eventsStream(spark, sfDir)
            .where(col("event_id") < 100)
          graft.streaming.StreamingOps.runToParquet(
            graft.streaming.StreamingFunnel(
              warmStream, Seq("view", "click", "purchase"),
              within = "12 HOURS").toDF(),
            "warm_funnel").count()
        } finally {
          prev match {
            case Some(v) => spark.conf.set(provKey, v)
            case None => spark.conf.unset(provKey)
          }
        }
      }
      // WindowExec (rank frames) + the token-explode/df-join shape of
      // q_tfidf — small in absolute terms but 2.4-2.8x cold in r10
      warm("window-tfidf") {
        graft.sources.Tables.load(spark, sfDir, "orders").limit(2048)
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
          .where(col("rn") <= 3).count()
        val tok = d64.select(col("doc_id"),
          explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfq = tok.groupBy("token")
          .agg(countDistinct(col("doc_id")).as("df"))
        tf.join(dfq, "token")
          .select(round(col("tf") * log((col("df") + 1).cast("double")), 6))
          .count()
      }
    }

    // optional subset for local iteration: SPARK_GRAFT_QUERIES=q_a,q_b
    val onlyFilter = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // host-weather telemetry: load + steal sampled around the timed
    // region make one-shot readings self-adjudicating against the
    // documented 185-vs-238 s same-code noisy-neighbor band
    val (l1Before, l5Before, _) = loadavg()
    val (stealBefore, totalBefore) = cpuJiffies()
    // fixed-work calibration probes: load/steal miss the second observed
    // weather mode (memory-bandwidth/LLC contention that reports ZERO
    // steal yet ran the same code 1.2-1.3x slower — see BASELINE.md), so
    // time the two regimes it hits directly. Readings scale with current
    // box speed, not with this suite's code, making any two JSON lines
    // comparable: a run whose calib values match another's ran on an
    // equally-fast box, and its query deltas are code.
    import org.apache.spark.sql.functions.{col, lit, pmod, sum}
    val calibCpuSec = {
      val c0 = System.nanoTime()
      spark.range(400L * 1000 * 1000)
        .select(sum(col("id") * 3 + 1)).collect()
      (System.nanoTime() - c0) / 1e9
    }
    val calibShuffleSec = {
      val s0 = System.nanoTime()
      spark.range(30L * 1000 * 1000)
        .withColumn("k", pmod(col("id") * 2654435761L, lit(100000)))
        .groupBy("k").agg(sum(col("id")).as("s"))
        .agg(sum(col("s"))).collect()
      (System.nanoTime() - s0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyFilter.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // settle between queries: drop persisted intermediates of the prior
      // query and absorb the (async) unpersist + GC churn outside the
      // timed region, so it doesn't land on whichever query runs next
      spark.catalog.clearCache()
      System.gc()
      spark.range(1000).count()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val (l1After, l5After, _) = loadavg()
    val (stealAfter, totalAfter) = cpuJiffies()
    val stealPct =
      if (totalAfter > totalBefore)
        100.0 * (stealAfter - stealBefore) / (totalAfter - totalBefore)
      else Double.NaN
    // Locale.ROOT: the default-locale f interpolator renders 0.42 as
    // "0,42" on comma-decimal locales, corrupting the JSON line
    def j(d: Double): String =
      if (d.isNaN) "null"
      else String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val host = s""""host":{"load1_before":${j(l1Before)},""" +
      s""""load1_after":${j(l1After)},"load5_before":${j(l5Before)},""" +
      s""""load5_after":${j(l5After)},"steal_pct":${j(stealPct)},""" +
      s""""calib_cpu_sec":${j(calibCpuSec)},""" +
      s""""calib_shuffle_sec":${j(calibShuffleSec)}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$host}""")
    // Third bounded line: the driver's BENCH_r*.json `tail` capture
    // truncates the giant per-query line from the START, hiding the
    // alphabetical front half (63 of 114 rows in r13). Print the top-20
    // slowest rows plus every row exceeding 1.5x a committed per-query
    // reference (bench_ref.json, written by the campaign from its
    // min-of-3), so >2x adjudication never needs campaign forensics.
    // The ref compare only applies when the ref was taken at this sfDir.
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF",
      "bench_ref.json")
    val refQueries: Map[String, Double] =
      try {
        val text = scala.io.Source.fromFile(refPath).mkString
        val sfOk = {
          val m = """"sf"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(text)
          m.exists(_.group(1) == sfDir)
        }
        if (!sfOk) Map.empty
        else """"(q_[a-z0-9_]+)"\s*:\s*([0-9.eE+-]+)""".r
          .findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    def j3(d: Double): String =
      if (d.isNaN) "null"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val slowest = results.sortBy(-_._2).take(20)
    // all outliers, worst first; the emitted map is capped at 40 rows to
    // stay tail-sized, but outliers_total records the uncapped count so
    // a global elevation (host weather lifting every row past 1.5x) is
    // distinguishable from 40 query-local regressions
    val outliersAll = results
      .filter { case (n, v) =>
        refQueries.get(n).exists(r => r > 0 && v > 1.5 * r) }
      .sortBy { case (n, v) => -(v / refQueries(n)) }
    val outliers = outliersAll.take(40)
    def rowsJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + j3(v) }
        .mkString("{", ",", "}")
    val outJson = outliers
      .map { case (k, v) =>
        "\"" + k + "\":{\"sec\":" + j3(v) +
          ",\"ref\":" + j3(refQueries(k)) +
          ",\"ratio\":" + j3(v / refQueries(k)) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"slowest","top":${rowsJson(slowest)},""" +
      s""""over_1p5x_ref":$outJson,""" +
      s""""outliers_total":${outliersAll.size},""" +
      s""""ref_rows":${refQueries.size},"sf":"$sfDir"}""")
    // Compact total as the very LAST line: the driver's BENCH_r*.json
    // keeps only the final 2000 chars of output, and in r18 the
    // "slowest" line above (1.9k chars at 117 queries) pushed the
    // total's VALUE out of that tail, leaving the stamp unrecoverable
    // without campaign forensics. Printing the summary last makes the
    // stamp self-contained regardless of how wide the other lines grow.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"sf":"$sfDir",$host}""")
    spark.stop()
  }
}
