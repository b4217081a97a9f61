package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus assembly operators — the stage AFTER hygiene where a cleaned
  * corpus becomes actual training input (SURVEY.md §2.9 extension
  * surface): deterministic global shuffle + sharding, concat-and-chunk
  * context packing, and per-source temperature sampling (data mixing).
  * All are hash-keyed single-window plans with exact DuckDB oracles —
  * nothing sorts the corpus globally.
  */
object MixOps {

  /** Deterministic pseudorandom shuffle key: md5 over (doc_id, text) so
    * byte-identical duplicate docs still get distinct positions. */
  private def shuffleKey = md5(concat_ws(":", col("doc_id"), col("text")))

  /** Deterministic corpus shuffle + balanced shard assignment — the
    * reproducible "global shuffle" every training run needs. The md5 key
    * IS the random order (stable across runs, engines, and partitionings);
    * shard = first 8 hex digits mod `nShards` balances in expectation,
    * and position-within-shard is the md5 rank.
    *
    * Scale shape: ONE shuffle (the per-shard window); no global sort, no
    * total ordering across shards — each shard is an independent unit,
    * which is exactly how shard files are written and later consumed.
    * Output: (doc_id, shard, pos). */
  def shardAssign(docs: DataFrame, nShards: Int): DataFrame =
    docs
      .select(col("doc_id"), shuffleKey.as("m"))
      .withColumn("shard",
        conv(substring(col("m"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("m"), col("doc_id"))))
      .select(col("doc_id"), col("shard"), col("pos"))

  /** Concat-and-chunk context packing: documents are laid out in the
    * deterministic shuffle order WITHIN each shard, token counts are
    * cumulatively summed, and the concatenated token stream is cut into
    * fixed `budget`-token context windows (the standard LLM pretraining
    * layout — documents span window boundaries rather than being padded).
    * Per doc: the first and last context index it occupies in its shard.
    *
    * Scale shape: the cumulative sum is a per-shard running window — the
    * corpus-wide plan is one shuffle on shard and a per-shard sort, all
    * integer arithmetic (no doubles, so engine-exact). A single global
    * ordering would serialize into one partition; sharding first is what
    * makes packing parallel, and is also semantically right (each shard
    * is packed independently into its own context stream).
    * Output: (doc_id, shard, n_tokens, start_ctx, end_ctx, n_ctxs). */
  def packContexts(docs: DataFrame, nShards: Int, budget: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("m"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(
        col("doc_id"), shuffleKey.as("m"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("shard",
        conv(substring(col("m"), 1, 8), 16, 10).cast("long") % nShards)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("start_ctx"),
        expr(s"(cum - 1) div $budget").as("end_ctx"),
        expr(s"(cum - 1) div $budget - (cum - n_tokens) div $budget + 1")
          .as("n_ctxs"))
  }

  /** Per-source temperature sampling (data mixing): source `s` with
    * `cnt_s` documents gets a quota of min(cnt_s, ceil(k·√cnt_s)) —
    * the √ (temperature 0.5) flattens the source distribution so huge
    * crawl sources stop drowning small high-quality ones, the standard
    * mixing move. Quotas are filled deterministically by md5(text) rank,
    * so the sampled corpus is stable across runs and engines.
    *
    * Deliberately NOT normalized by Σ cnt^α across sources: quotas
    * depend only on each source's own count, which keeps every number
    * integer-or-IEEE-exact (a cross-source double sum would make the
    * result depend on summation order) and means adding a new source
    * never silently changes another source's sample.
    *
    * Scale shape: same two-phase pattern as
    * [[PipelineOps.stratifiedSample]] — per-source counts are one
    * aggregation broadcast back, a 16-bit hash-prefix bound prefilters
    * each source to ~4× its quota, and the per-source rank window sorts
    * only the survivors. Output: (doc_id, source, quota, rn). */
  /** Budget-constrained quality selection: keep the highest-quality
    * documents until a total token budget is exhausted — the data-
    * selection step every budgeted pretraining run performs. "Quality"
    * here is the integer per-100k stopword rate (n_stop·100000 div
    * n_tokens) so every comparison and cumulative sum is exact integer
    * arithmetic; callers with a model-based score can substitute any
    * integer key.
    *
    * The textbook formulation is a cumulative sum over the GLOBAL
    * quality order — a window with no partition, which Spark executes in
    * a single partition: the 100 TB anti-pattern. This implements the
    * distributed prefix-sum decomposition instead: (1) docs bucket by
    * quality div 1000 (bucket is a monotone function of the sort key, so
    * bucket-major order == global order); (2) one aggregation computes
    * per-bucket token totals and row counts, ≤ ~101 rows collected to
    * the driver; (3) an exclusive prefix sum over buckets (descending)
    * broadcasts back as each bucket's starting offset; (4) the running
    * sum windows only WITHIN buckets — fully parallel.
    *
    * A quality-HOMOGENEOUS corpus collapses most rows into one bucket,
    * degenerating step (4) toward the single-partition global window the
    * decomposition exists to avoid. Buckets over `maxBucketRows` rows
    * therefore SUB-SPLIT: their rows get a second-level group key
    * (q2 = exact q, d2 = doc_id div D) — both monotone in the
    * (q desc, doc_id) sort order, so group-major order still equals
    * global order — and the in-bucket exclusive prefix extends over the
    * per-(bucket, q2, d2) totals with one window over that (small)
    * totals frame. d2 splits same-q runs into `subSplits` doc_id RANGES
    * sized from the global max id: row counts per range track doc_id
    * density (uniform for synthetic and typical monotone id assignment;
    * pathological id skew degrades gracefully to fewer effective
    * splits). cum_tokens = bucket offset + group offset + in-group
    * running sum is IDENTICAL to the naive global window, which is
    * exactly what the q_select_budget oracle replays.
    * Output: (doc_id, q, n_tokens, cum_tokens, selected), all docs. */
  def selectUnderBudget(
      docs: DataFrame, budget: Long, maxBucketRows: Long = 4000000L,
      subSplits: Int = 32): DataFrame = {
    // n_tokens is barrier-wrapped so the >0 filter stays above this
    // projection instead of re-running the tokenizer regex in the scan
    // below the spread exchange
    val scored = Dedup.spread(docs)
      .select(
        col("doc_id"),
        graft.functions.PlanBarrier(docs.sparkSession,
          size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"),
        TextOps.matchCount(col("text"), TextOps.LangStopwords.head._2)
          .as("n_stop"))
      .where(col("n_tokens") > 0)
      .select(
        col("doc_id"), col("n_tokens"),
        expr("n_stop * 100000L div n_tokens").as("q"))
      .withColumn("bucket", expr("q div 1000"))
    val totals = scored.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("btok"), count(lit(1)).as("cnt"),
        max(col("doc_id")).as("mx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(-_._1)
    val offsets = totals.map(t => (t._1, t._2))
      .scanLeft((Long.MaxValue, 0L)) { case ((_, acc), (b, t)) => (b, acc + t) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
      .toSeq
    val offsetDf = docs.sparkSession
      .createDataFrame(offsets).toDF("bucket", "offset")
    val oversized = totals.filter(_._3 > maxBucketRows).map(_._1).toSeq
    val rangeWidth = math.max(1L,
      totals.map(_._4).maxOption.getOrElse(0L) / subSplits + 1L)
    val isOver =
      if (oversized.isEmpty) lit(false) else col("bucket").isin(oversized: _*)
    val grouped = scored
      .withColumn("q2", when(isOver, col("q")).otherwise(lit(0L)))
      .withColumn("d2",
        when(isOver, expr(s"doc_id div $rangeWidth")).otherwise(lit(0L)))
    // exclusive prefix over the per-group totals WITHIN each bucket: the
    // totals frame is tiny relative to the corpus (≤ distinct q x
    // subSplits rows per oversized bucket), so this window is cheap, and
    // the join back shares the (bucket, q2, d2) hash partitioning with
    // the final in-group window
    val wg = Window.partitionBy("bucket")
      .orderBy(col("q2").desc, col("d2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val groupOffsets = grouped.groupBy("bucket", "q2", "d2")
      .agg(sum(col("n_tokens")).as("gtok"))
      .withColumn("goff", coalesce(sum(col("gtok")).over(wg), lit(0L)))
      .drop("gtok")
    val w = Window.partitionBy("bucket", "q2", "d2")
      .orderBy(col("q").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped
      .join(broadcast(offsetDf), Seq("bucket"))
      .join(groupOffsets, Seq("bucket", "q2", "d2"))
      .withColumn("cum_tokens",
        col("offset") + col("goff") + sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"), col("q"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("selected"))
  }

  def temperatureSample(
      docs: DataFrame, sourceCol: String, k: Int): DataFrame = {
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("cnt"))
      .withColumn("quota",
        least(col("cnt"), ceil(lit(k.toDouble) * sqrt(col("cnt")))))
    val bound = least(
      lit(65535),
      ceil(lit(65536.0 * 4) * col("quota").cast("double") /
        col("cnt").cast("double")).cast("int"))
    docs.join(broadcast(counts), sourceCol)
      .where(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") < bound)
      .withColumn("rn", row_number().over(
        Window.partitionBy(sourceCol).orderBy(md5(col("text")), col("doc_id"))))
      .where(col("rn") <= col("quota"))
      .select(col("doc_id"), col(sourceCol), col("quota"), col("rn"))
  }

  /** UniMax-style epoch allocation (Chung et al., 2023): distribute a
    * token budget across groups (languages/sources) so that no group
    * repeats more than `maxEpochs` times and the leftover budget is
    * spread UNIFORMLY over the groups too large to cap — the mixing rule
    * that avoids both starving small languages and over-repeating them.
    *
    * The paper's greedy loop (visit groups ascending by size; each takes
    * min(cap, remaining budget / remaining groups)) has a CLOSED
    * windowed form: with exact (unfloored) shares, once a group takes
    * less than its cap the uniform share is invariant for every later
    * group (B' / (k-1) = (B - B/k) / (k-1) = B/k), so capped groups are
    * exactly the prefix where `cap_i * (n-i+1) + cumcap_{<i} <= budget`
    * — and that test is monotone in i (caps ascend), so no iteration is
    * needed: group i is capped iff its own test passes. Allocations
    * floor only at the end (uncapped share = (budget - capped_sum) DIV
    * n_uncapped), which is the loop with rational shares, not the loop
    * with per-step floored shares (EpochAllocateSpec pins the
    * equivalence).
    *
    * All arithmetic is integer (caps, budget = total * num DIV den,
    * floor-divided uniform share, micro-epochs), so an independent SQL
    * engine reproduces every row bit-for-bit.
    *
    * Scale shape: the corpus-sized work is the ONE tokenize+count
    * aggregation; everything after runs in window functions over
    * |groups| rows (languages/domains — bounded far below partition
    * size), with zero driver collects and no joins back to the corpus.
    * Output: (group, n_docs, n_tokens, capped, alloc_tokens,
    * epochs_micro). */
  def epochAllocate(
      docs: DataFrame, groupCol: String = "lang", maxEpochs: Long = 2L,
      budgetNum: Long = 3L, budgetDen: Long = 2L): DataFrame = {
    val per = docs.groupBy(groupCol).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    val wOrd = Window.orderBy(col("n_tokens"), col(groupCol))
    val wPrefix = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("cap", col("n_tokens") * maxEpochs)
      .withColumn("i", row_number().over(wOrd))
      .withColumn("cum_prev",
        coalesce(sum(col("cap")).over(wPrefix), lit(0L)))
      .withColumn("n_groups", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("n_tokens")).over(wAll))
      .withColumn("budget", expr(s"(total * $budgetNum) DIV $budgetDen"))
      .withColumn("capped",
        col("cap") * (col("n_groups") - col("i") + 1) + col("cum_prev")
          <= col("budget"))
      .withColumn("capped_sum", coalesce(
        sum(when(col("capped"), col("cap"))).over(wAll), lit(0L)))
      .withColumn("n_uncapped",
        col("n_groups") -
          sum(when(col("capped"), 1L).otherwise(0L)).over(wAll))
      .withColumn("alloc_tokens",
        when(col("capped"), col("cap")).otherwise(expr(
          "(budget - capped_sum) DIV greatest(n_uncapped, 1)")))
      // epochs_micro through decimal(38,0): alloc_tokens * 1000000 wraps
      // Long past ~9.2e12 tokens per group — well inside a 100 TB corpus
      // — while the decimal product is exact and the quotient (≤ maxEpochs
      // * 1e6) always fits back in a Long
      .withColumn("epochs_micro",
        expr("CASE WHEN n_tokens > 0 " +
          "THEN CAST(CAST(alloc_tokens AS DECIMAL(38,0)) * 1000000 " +
          "DIV n_tokens AS BIGINT) ELSE 0L END"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("capped"),
        col("alloc_tokens"), col("epochs_micro"))
  }

  /** Data Selection via Importance Resampling (DSIR — Xie et al.,
    * NeurIPS 2023): score every raw document by how much more likely its
    * unigram bag is under the TARGET distribution (the docs matching
    * `targetFilter`) than under the raw corpus, and keep the top `n`.
    * Per-token log-likelihood ratio with add-`alpha` smoothing over the
    * raw vocabulary:
    *   w(t) = ln((c_tgt(t)+α)/(N_tgt+αV)) − ln((c_raw(t)+α)/(N_raw+αV))
    * and a document's importance is the sum of w over its token
    * OCCURRENCES (the paper's bag-of-features log importance weight).
    *
    * Engine-parity design: each token's w is rounded to micro-units and
    * summed as BIGINT (`score_micro`) — integer sums are independent of
    * summation order, so the score is bit-identical across engines (the
    * same "cents" trick as the revenue queries; a double sum here would
    * hash-flake). Ranking ties break by doc_id; documents with zero
    * tokens score 0.
    *
    * Scale shape: one token-key aggregation (map-side combined) builds
    * the count table; the three corpus scalars (N_tgt, N_raw, V) are a
    * single driver row; weights join back to occurrences on the token
    * key (no broadcast — vocabulary is unbounded); the per-doc sum
    * shuffles on doc_id; top-n is a distributed partial sort + limit,
    * never a global sort. Output: (doc_id, score_micro, selected) for
    * the top-n rows only. */
  def dsirSelect(
      docs: DataFrame,
      targetFilter: org.apache.spark.sql.Column,
      n: Int,
      alpha: Double = 0.5): DataFrame = {
    val toks = docs.select(
      col("doc_id"), targetFilter.as("is_tgt"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("c_raw"),
      count(when(col("is_tgt"), 1)).as("c_tgt"))
    // three corpus scalars; one driver row (the bounded-collect pattern)
    val t = counts.agg(
      sum(col("c_raw")).cast("double").as("n_raw"),
      sum(col("c_tgt")).cast("double").as("n_tgt"),
      count(lit(1)).cast("double").as("v")).first()
    val (nRaw, nTgt, v) = (t.getDouble(0), t.getDouble(1), t.getDouble(2))
    val w = counts.select(col("tok"),
      round(
        (log((col("c_tgt") + alpha) / (nTgt + alpha * v)) -
          log((col("c_raw") + alpha) / (nRaw + alpha * v))) * 1e6, 0)
        .cast("long").as("w_micro"))
    val scores = toks.join(w, Seq("tok"))
      .groupBy("doc_id").agg(sum(col("w_micro")).as("score_micro"))
    docs.select(col("doc_id"))
      .join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(n)
      .withColumn("selected", lit(true))
  }

  /** Corpus-wide RANK of a score column — the primitive behind
    * percentile-calibrated quality thresholds ("keep the top 30%"):
    * rank = row_number over (score DESC, doc_id) across the WHOLE
    * corpus, computed without the single-partition global window that
    * textbook row_number implies.
    *
    * Same distributed prefix-sum decomposition as [[selectUnderBudget]]:
    * (1) bucket by floor(score / width), with width derived from the
    * OBSERVED min/max so the bucket count — and therefore the driver
    * collect in step 2 — is bounded by ~2^16 regardless of the score
    * range (a fixed width would collect range/width rows: unbounded for
    * arbitrary bigint scores). Floor of a monotone-rounded double
    * quotient keeps buckets monotone in the sort key for the full bigint
    * range, including negatives; (2) one aggregation collects per-bucket
    * row counts; (3) a driver exclusive prefix in bucket-descending
    * order broadcasts back as each bucket's starting rank; (4)
    * row_number windows only WITHIN buckets. Oversized buckets (a
    * score-homogeneous corpus) sub-split by (exact score, doc_id range)
    * exactly as selectUnderBudget does.
    * Input: (doc_id, score: bigint). Output: (doc_id, score, rnk). */
  def globalRank(
      scores: DataFrame, maxBucketRows: Long = 4000000L,
      subSplits: Int = 32): DataFrame =
    globalRankReleasable(scores, maxBucketRows, subSplits).df

  /** [[globalRank]]'s result paired with a deterministic release handle
    * for the internally-persisted (doc_id, score) projection — the
    * [[graft.ext.PipelineOps.ContainmentIndex]] pattern. The registry
    * path relies on Verify/Bench `clearCache()`, but a library caller
    * that has finished its action on `df` should call `release()` so
    * long-lived sessions don't accumulate MEMORY_AND_DISK blocks
    * (see `TextOps.trainedClassifier`, which releases right after its
    * 1-row threshold collect). */
  final case class RankedScores(df: DataFrame, private val cached: DataFrame) {
    def release(): Unit = { cached.unpersist(); () }
  }

  def globalRankReleasable(
      scores: DataFrame, maxBucketRows: Long = 4000000L,
      subSplits: Int = 32): RankedScores = {
    // The decomposition reads its input FOUR times (min/max width scan,
    // bucket totals, group offsets, final join) plus once more for the
    // caller's action — so the (doc_id, score) projection is persisted
    // here, materialized by the min/max action; otherwise every pass
    // would replay the caller's upstream plan (for q_rank_calibrate,
    // the classifier kernel over the whole corpus — measured as a full
    // extra scan per pass). 16 B/row, spills to disk; it stays cached
    // for the caller's own action on the returned frame — release()
    // (or clearCache) when done.
    val proj = scores.select(col("doc_id"), col("score"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // width from observed range: one column-pruned min/max scan caps the
    // bucket-count collect at ~targetBuckets for ANY score distribution
    val targetBuckets = 1L << 16
    val mm = proj.agg(
      min(col("score")).as("mn"), max(col("score")).as("mx")).first()
    val width =
      if (mm.isNullAt(0)) 4096L
      else {
        val range = BigInt(mm.getLong(1)) - BigInt(mm.getLong(0))
        ((range / targetBuckets + 1) max BigInt(4096L)).toLong
      }
    val scored = proj
      .withColumn("bucket",
        expr(s"CAST(FLOOR(score / ${width}.0D) AS BIGINT)"))
    val totals = scored.groupBy("bucket")
      .agg(count(lit(1)).as("cnt"), max(col("doc_id")).as("mx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(-_._1)
    val offsets = totals.map(t => (t._1, t._2))
      .scanLeft((Long.MaxValue, 0L)) { case ((_, acc), (b, c)) => (b, acc + c) }
      .sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
      .toSeq
    val offsetDf = scores.sparkSession
      .createDataFrame(offsets).toDF("bucket", "offset")
    val oversized = totals.filter(_._2 > maxBucketRows).map(_._1).toSeq
    val rangeWidth = math.max(1L,
      totals.map(_._3).maxOption.getOrElse(0L) / subSplits + 1L)
    val isOver =
      if (oversized.isEmpty) lit(false) else col("bucket").isin(oversized: _*)
    val grouped = scored
      .withColumn("s2", when(isOver, col("score")).otherwise(lit(0L)))
      .withColumn("d2",
        when(isOver, expr(s"doc_id div $rangeWidth")).otherwise(lit(0L)))
    val wg = Window.partitionBy("bucket")
      .orderBy(col("s2").desc, col("d2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val groupOffsets = grouped.groupBy("bucket", "s2", "d2")
      .agg(count(lit(1)).as("gcnt"))
      .withColumn("goff", coalesce(sum(col("gcnt")).over(wg), lit(0L)))
      .drop("gcnt")
    val w = Window.partitionBy("bucket", "s2", "d2")
      .orderBy(col("score").desc, col("doc_id"))
    val ranked = grouped
      .join(broadcast(offsetDf), Seq("bucket"))
      .join(groupOffsets, Seq("bucket", "s2", "d2"))
      .select(
        col("doc_id"), col("score"),
        (col("offset") + col("goff") +
          row_number().over(w).cast("long")).as("rnk"))
    RankedScores(ranked, proj)
  }

  /** Corpus RECIPE materialization: turn a [[epochAllocate]] token
    * allocation into the concrete document multiset a training run
    * consumes. Each group (language) contributes
    * `alloc_tokens DIV group_tokens` FULL copies of itself (the whole
    * epochs), and its top-QUALITY documents — hashed-classifier score
    * order — fill the remaining `alloc_tokens MOD group_tokens` budget
    * one more time (the fractional epoch). This is the standard
    * construction: small languages repeat whole, the big language is
    * quality-truncated to its share.
    *
    * Scale shape: one tokenize+score pass (the classifier kernel is
    * zero-shuffle) + the allocation's own tokenize aggregation; the
    * per-group allocation table (≤ |groups| rows) broadcasts back; the
    * only corpus-sized shuffle is the per-group quality window. All
    * integer arithmetic, so the oracle replays every row bit-for-bit.
    * Output: (doc_id, group, n_tokens, score, n_copies, extra,
    * n_appearances). */
  def corpusRecipe(
      docs: DataFrame, groupCol: String = "lang", maxEpochs: Long = 2L,
      budgetNum: Long = 3L, budgetDen: Long = 2L): DataFrame = {
    val alloc = epochAllocate(docs, groupCol, maxEpochs, budgetNum, budgetDen)
      .select(col(groupCol), col("n_tokens").as("group_tokens"),
        col("alloc_tokens"))
    val scored = graft.ext.TextOps.hashClassifier(docs)
      .select(col("doc_id"), col("score_micros").as("score"))
    val base = docs
      .select(col("doc_id"), col(groupCol),
        size(graft.ext.TextOps.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .join(scored, Seq("doc_id"))
      .join(broadcast(alloc), Seq(groupCol))
    val wq = Window.partitionBy(groupCol)
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("n_copies",
        expr("CASE WHEN group_tokens > 0 " +
          "THEN alloc_tokens DIV group_tokens ELSE 0 END"))
      .withColumn("rem",
        expr("CASE WHEN group_tokens > 0 " +
          "THEN alloc_tokens % group_tokens ELSE 0 END"))
      .withColumn("cum", sum(col("n_tokens")).over(wq))
      .select(
        col("doc_id"), col(groupCol), col("n_tokens"), col("score"),
        col("n_copies"),
        (col("cum") <= col("rem")).as("extra"),
        (col("n_copies") +
          when(col("cum") <= col("rem"), 1L).otherwise(0L))
          .as("n_appearances"))
  }

  /** Materialize the deterministic global shuffle ([[shardAssign]]) as
    * on-disk training shards: `path/shard=K/` directories whose parquet
    * rows are laid out in the md5-shuffle order — the layout a training
    * loader consumes sequentially, so row order INSIDE the files is the
    * contract (a training run must not see crawl order).
    *
    * Scale shape: one repartition on shard (each shard's rows meet on
    * one task) + a within-partition sort by (shard, m) — no global sort;
    * `partitionBy` then writes each shard's rows, in order, under its
    * own directory. Parquet preserves in-file row order, so reading
    * `shard=K` back in file-name order replays the shard's exact
    * training sequence. Returns the written row count. */
  def writeShards(
      docs: DataFrame, nShards: Int, path: String,
      payload: Seq[String] = Seq("text")): Long = {
    val cols = col("doc_id") +: payload.map(col) :+ shuffleKey.as("m")
    val assigned = docs.select(cols: _*)
      .withColumn("shard",
        conv(substring(col("m"), 1, 8), 16, 10).cast("long") % nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("m"), col("doc_id"))
    assigned.write.mode("overwrite").partitionBy("shard").parquet(path)
    assigned.sparkSession.read.parquet(path).count()
  }
}
