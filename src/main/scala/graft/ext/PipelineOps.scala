package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a training-data pipeline runs before anything
  * else (SURVEY.md §2.9 extension surface): chunk-level dedup (the
  * paragraph-dedup of corpora without line structure), boilerplate n-gram
  * detection/filtering, and PII redaction. All are single-shuffle or pure
  * projections, with exact DuckDB oracles.
  */
object PipelineOps {

  /** Chunk-level corpus dedup (paragraph-dedup analog): split each doc into
    * non-overlapping `k`-token chunks ([[graft.functions.ChunksExpr]],
    * zero-exchange), count each chunk's corpus-wide document frequency, and
    * report per doc how much of it duplicates material seen elsewhere.
    *
    * Scale shape: chunks are joined/aggregated by md5(chunk) — the shuffle
    * carries 32-hex keys, never chunk text, and the whole pipeline is ONE
    * shuffle on the chunk hash plus one on doc_id. Output per doc:
    * (doc_id, n_chunks, n_dup_chunks, dup_ratio). */
  def chunkDedup(docs: DataFrame, k: Int = 16): DataFrame = {
    val ch = Dedup.spread(docs)
      .select(
        col("doc_id"),
        explode(graft.functions.TextKernels.chunkArray(
          docs.sparkSession, col("text"), k)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("ch"))
    val df = ch.groupBy("ch").agg(countDistinct(col("doc_id")).as("df"))
    ch.join(df, Seq("ch"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("df") > 1, 1)).as("n_dup_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"))
  }

  /** Per-document CDC chunk rows (doc_id, ch = md5(chunk), clen): cut
    * positions from ONE kernel pass ([[graft.functions.CdcCutsExpr]] —
    * the relational per-position md5(substr) formulation pays a hex
    * round-trip and a string allocation per character), materialized as
    * a COLUMN so the slicing lambdas read the array instead of
    * re-running the kernel per element. */
  private def cdcChunkRows(
      docs: DataFrame, w: Int, mask: Int): DataFrame = {
    val pre = Dedup.spread(docs)
      .select(col("doc_id"), lower(col("text")).as("t"),
        graft.functions.TextKernels.cdcCutsCol(
          docs.sparkSession, col("text"), w, mask).as("cuts"))
      .select(col("doc_id"), col("t"), length(col("t")).as("n"),
        col("cuts"), size(col("cuts")).as("nc"))
    val chunks = filter(
      transform(sequence(lit(1), col("nc") + 1), k => {
        val s = when(k === 1, lit(1))
          .otherwise(element_at(col("cuts"), k - 1) + w)
        val e = when(k === col("nc") + 1, col("n"))
          .otherwise(element_at(col("cuts"), k) + (w - 1))
        col("t").substr(s, e - s + 1)
      }),
      ch => ch =!= lit(""))
    pre
      .select(col("doc_id"), explode(chunks).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("ch"),
        length(col("chunk")).cast("long").as("clen"))
  }

  /** Per-doc aggregation shared by the self- and against- forms. */
  private def cdcAgg(joined: DataFrame): DataFrame =
    joined
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("df") > 1, 1)).as("n_dup_chunks"),
        sum(when(col("df") > 1, col("clen")).otherwise(0L)).as("dup_chars"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        col("dup_chars"),
        (col("n_dup_chunks").cast("double") / col("n_chunks"))
          .as("dup_ratio"))

  /** CDC chunk-frequency reference table of a corpus — the frozen side
    * of [[cdcDedupAgainst]] (build once, probe per batch). */
  def cdcChunkDf(
      refDocs: DataFrame, w: Int = 8, mask: Int = 64): DataFrame =
    cdcChunkRows(refDocs, w, mask)
      .groupBy("ch").agg(countDistinct(col("doc_id")).as("df"))

  /** Content-defined chunking dedup (the LBFS/rsync CDC family): chunk
    * boundaries are cut wherever the rolling w-char window's hash meets
    * the mask (`u32(md5(window)) % mask == 0`), so boundaries depend on
    * CONTENT, not position — inserting or deleting a run of characters
    * reshapes only the chunks it touches, and every chunk after the next
    * surviving cut keeps its identity. Fixed-size chunking
    * ([[chunkDedup]]) loses ALL chunk alignment after an insertion; CDC
    * is the standard answer (`CdcDedupSpec` pins the robustness
    * property). Expected chunk length is ~`mask` characters.
    *
    * Scale shape: cuts + chunk slices are per-row array expressions
    * inside the scan (no explode until chunks exist, one md5 per
    * window — the same per-position cost the winnowing fingerprints
    * pay); then one shuffle on the chunk hash (cross-doc df) and one on
    * doc_id, exactly the [[chunkDedup]] plan. The chunk rows feed both
    * join sides, so they are persisted — the probe side and the df side
    * are NOT canonically-equal exchanges, and without the cache the
    * kernel scan would run twice; the cache stays for the caller's
    * action (the globalRank/pageRank contract: unpersist/clearCache when
    * done).
    * Output: (doc_id, n_chunks, n_dup_chunks, dup_chars, dup_ratio);
    * a dup chunk is one whose hash appears in >1 distinct document. */
  def cdcChunkDedup(
      docs: DataFrame, w: Int = 8, mask: Int = 64): DataFrame =
    cdcChunkDedupReleasable(docs, w, mask).df

  /** [[cdcChunkDedup]]'s result paired with a deterministic release
    * handle for the internally-persisted chunk rows (the
    * [[ContainmentIndex]] pattern): the registry path relies on
    * Verify/Bench `clearCache()`, but a library caller should
    * `release()` once its action on `df` completes so long-lived
    * sessions don't accumulate MEMORY_AND_DISK blocks. */
  final case class CdcDedupResult(df: DataFrame, private val cached: DataFrame) {
    def release(): Unit = { cached.unpersist(); () }
  }

  def cdcChunkDedupReleasable(
      docs: DataFrame, w: Int = 8, mask: Int = 64): CdcDedupResult = {
    val rows = cdcChunkRows(docs, w, mask)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CdcDedupResult(
      cdcAgg(rows.join(
        rows.groupBy("ch").agg(countDistinct(col("doc_id")).as("df")),
        Seq("ch"))),
      rows)
  }

  /** CDC dedup scoring of `aDocs` against a STATIC reference
    * chunk-frequency table (on-ingest form; chunks unseen by the
    * reference count df 0). With aDocs == the reference corpus this
    * reduces exactly to [[cdcChunkDedup]]. */
  def cdcDedupAgainst(
      refDf: DataFrame, aDocs: DataFrame,
      w: Int = 8, mask: Int = 64): DataFrame =
    cdcAgg(cdcChunkRows(aDocs, w, mask)
      .join(refDf, Seq("ch"), "left")
      .na.fill(0L, Seq("df")))

  /** Boilerplate detection: shingles occurring in >= `minDf` distinct
    * documents are boilerplate (navigation chrome, license headers, shared
    * templates); a document whose distinct-shingle set is more than
    * `maxRatio` boilerplate is dropped. One shuffle on the shingle (df
    * count), one on doc_id (per-doc ratio) — the df side aggregates to the
    * distinct-shingle table, never rejoining raw text.
    * Output: (doc_id, n_sh, boiler_sh, boiler_ratio, keep). */
  def boilerplate(
      docs: DataFrame, minDf: Long = 3, maxRatio: Double = 0.3): DataFrame =
    boilerplateImpl(docs, identity, lit(minDf), maxRatio)

  /** [[boilerplate]] with the FRACTIONAL df floor max(3, 1%·|docs|)
    * computed inside the plan: the 1-row corpus count broadcasts into
    * the per-shingle classification, so constructing the DataFrame
    * triggers no action (the eager `docs.count()` this replaces cost an
    * extra corpus scan at query-BUILD time). The 1-row cross join is a
    * BroadcastNestedLoopJoin, not a CartesianProduct — same bounded
    * shape as the other probe-frame sites the plan tripwire allows. */
  def boilerplateFractional(
      docs: DataFrame, maxRatio: Double = 0.3): DataFrame = {
    val nDocs = broadcast(docs.agg(count(lit(1)).as("__n_docs")))
    val minDfCol = greatest(
      lit(3L), ceil(lit(0.01) * col("__n_docs")).cast("long"))
    boilerplateImpl(docs, _.crossJoin(nDocs), minDfCol, maxRatio)
  }

  /** Shared body of the two variants above: `attachFloor` optionally
    * cross-joins the broadcast 1-row corpus-count frame the fractional
    * floor column reads from. */
  private def boilerplateImpl(
      docs: DataFrame, attachFloor: DataFrame => DataFrame,
      minDf: Column, maxRatio: Double): DataFrame =
    boilerplateShImpl(Dedup.docShingles(docs), attachFloor, minDf, maxRatio)

  /** [[boilerplateImpl]] from an already-exploded (doc_id, shingle)
    * frame — lets [[hygienePipeline]] feed all corpus branches from ONE
    * shared shingle scan instead of re-running the tokenize+shingle
    * kernel per branch. Expressions verbatim. */
  private def boilerplateShImpl(
      sh: DataFrame, attachFloor: DataFrame => DataFrame,
      minDf: Column, maxRatio: Double): DataFrame = {
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    attachFloor(sh.join(df, Seq("shingle")))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_sh"),
        count(when(col("df") >= minDf, 1)).as("boiler_sh"))
      .select(
        col("doc_id"), col("n_sh"), col("boiler_sh"),
        (col("boiler_sh").cast("double") / col("n_sh")).as("boiler_ratio"),
        (col("boiler_sh").cast("double") / col("n_sh") <= maxRatio).as("keep"))
  }

  /** Distinct-shingle document frequencies of a reference corpus —
    * the static side for [[boilerplateAgainst]] (callers persist). */
  def shingleDf(refDocs: DataFrame, n: Int = 3): DataFrame =
    Dedup.docShingles(refDocs, n).groupBy("shingle").agg(count(lit(1)).as("df"))

  /** Boilerplate scoring of `aDocs` against a STATIC reference df table
    * (the on-ingest form: arriving docs are scored by how much of their
    * shingle set is boilerplate IN THE REFERENCE corpus — shingles the
    * reference has never seen count df 0). With aDocs == the reference
    * corpus this reduces exactly to [[boilerplate]] (every shingle then
    * has df >= 1, so the left join + fill(0) changes nothing). */
  def boilerplateAgainst(
      refDf: DataFrame, aDocs: DataFrame, minDf: Long = 3,
      maxRatio: Double = 0.3, n: Int = 3): DataFrame =
    Dedup.docShingles(aDocs, n)
      .join(refDf, Seq("shingle"), "left")
      .na.fill(0L, Seq("df"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_sh"),
        count(when(col("df") >= minDf, 1)).as("boiler_sh"))
      .select(
        col("doc_id"), col("n_sh"), col("boiler_sh"),
        (col("boiler_sh").cast("double") / col("n_sh")).as("boiler_ratio"),
        (col("boiler_sh").cast("double") / col("n_sh") <= maxRatio).as("keep"))

  /** Chunk-hash document frequencies of a reference corpus — the static
    * side for [[chunkDedupAgainst]] (callers persist). */
  def chunkDf(refDocs: DataFrame, k: Int = 16): DataFrame =
    Dedup.spread(refDocs)
      .select(col("doc_id"), explode(graft.functions.TextKernels.chunkArray(
        refDocs.sparkSession, col("text"), k)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("ch"))
      .groupBy("ch").agg(countDistinct(col("doc_id")).as("df"))

  /** Chunk-level dedup scoring of `aDocs` against a STATIC reference
    * chunk-frequency table (on-ingest form; chunks unseen by the
    * reference count df 0). With aDocs == the reference corpus this
    * reduces exactly to [[chunkDedup]]. */
  def chunkDedupAgainst(
      refDf: DataFrame, aDocs: DataFrame, k: Int = 16): DataFrame =
    Dedup.spread(aDocs)
      .select(col("doc_id"), explode(graft.functions.TextKernels.chunkArray(
        aDocs.sparkSession, col("text"), k)).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("ch"))
      .join(refDf, Seq("ch"), "left")
      .na.fill(0L, Seq("df"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("df") > 1, 1)).as("n_dup_chunks"))
      .select(
        col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"))

  /** Directed shingle-containment pairs: |S_a ∩ S_b| / |S_a| >= threshold
    * flags doc_a as (near-)contained in doc_b — quotation / verbatim-
    * inclusion / partial-duplicate detection, which symmetric Jaccard
    * misses when the containing doc is much longer.
    *
    * Default path is the PREFIX-FILTERED candidate join (recall 1, see
    * [[containmentPairsPrefix]]); `exact = true` routes through the
    * all-pairs shingle self-join baseline ([[containmentPairsExact]]),
    * whose candidate volume is Σ over shingles of freq² — fine on bounded
    * shingle frequency, a scale-killer with hot shingles. Both return
    * identical rows (the prefix filter is lossless, not approximate).
    * Output: (doc_a, doc_b, containment). */
  def containmentPairs(
      docs: DataFrame, threshold: Double, n: Int = 3,
      exact: Boolean = false): DataFrame =
    if (exact) containmentPairsExact(docs, threshold, n)
    else containmentPairsPrefix(docs, threshold, n)

  /** All-pairs exact baseline for [[containmentPairs]] — the direct
    * shingle self-join, same shape as [[Dedup.jaccardNearDup]]. */
  def containmentPairsExact(
      docs: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh = Dedup.docShingles(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .where(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    val out = inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / col("na")).as("containment"))
      .where(col("containment") >= threshold)
    val pairs = Lineage.cut(out)
    sh.unpersist()
    pairs
  }

  /** Prefix-filtered containment — the 100 TB path. Containment is
    * DIRECTED, so symmetric MinHash banding under-recalls when
    * |S_b| ≫ |S_a|; the lossless alternative is the AllPairs/PPJoin-style
    * prefix filter adapted to the containment bound: if
    * |S_a ∩ S_b| / |S_a| >= t then at most ⌊(1-t)·|S_a|⌋ of a's shingles
    * are missing from S_b, so in ANY fixed global shingle order at least
    * one of a's first ⌈(1-t)·|S_a|⌉ + 1 shingles must appear in S_b
    * (pigeonhole; the ceil absorbs fp jitter on the bound). Ordering
    * rarest-first (global document frequency asc, shingle asc as the
    * tiebreak) makes those prefix shingles the LEAST shared ones, so the
    * candidate join fans out minimally — hot boilerplate shingles never
    * enter a prefix unless a doc is almost entirely boilerplate.
    *
    * Plan shape: df-count (1 shuffle on shingle), per-doc rank window
    * (1 shuffle on doc_id; per-doc sort only), prefix ⋈ inverted index on
    * shingle (1 shuffle; prefix side is ~(1-t) of the corpus), then exact
    * directed verification ONLY on candidates via the broadcast-pairs
    * pattern of [[Dedup.jaccardFor]]. No corpus self-join anywhere.
    * Identical output to [[containmentPairsExact]] — verification is
    * exact and the filter has recall 1 by construction. */
  def containmentPairsPrefix(
      docs: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val idx = buildContainmentIndex(docs, n)
    val pairs = Lineage.cut(containmentCore(idx, idx.sets, threshold))
    idx.release()
    pairs
  }

  /** Precomputed static side of prefix-filtered containment: the shingle
    * inverted index, the per-doc rarest-first sorted shingle arrays, and
    * the global shingle document frequencies. Built ONCE and persisted —
    * the self-join batch query uses it for both sides, and the
    * streaming-ingest path scores every arriving microbatch against the
    * same index without recomputing any of it. */
  final case class ContainmentIndex(sh: DataFrame, sets: DataFrame, df: DataFrame) {
    def release(): Unit = { sh.unpersist(); sets.unpersist(); df.unpersist() }
  }

  def buildContainmentIndex(refDocs: DataFrame, n: Int = 3): ContainmentIndex = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = Dedup.docShingles(refDocs, n).persist(lvl)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df")).persist(lvl)
    ContainmentIndex(sh, sortedSets(sh, df).persist(lvl), df)
  }

  /** ONE doc_id aggregation produces everything per-doc: the full (still
    * distinct) shingle multiset sorted rarest-first by (global df,
    * shingle) plus its size — no window (a window would re-sort the same
    * rows after an identical shuffle). Shingles absent from `df` (an
    * arriving doc probing a reference index) get df 0 and sort FIRST:
    * they are maximally discriminating — an absent prefix shingle simply
    * generates no candidates, and if >= prefix-length of a doc's shingles
    * are absent from the index entirely, no reference doc can reach the
    * containment threshold, so zero candidates is the CORRECT answer. */
  private def sortedSets(aSh: DataFrame, df: DataFrame): DataFrame =
    aSh.join(df, Seq("shingle"), "left")
      .na.fill(0L, Seq("df"))
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(col("df"), col("shingle")))).as("sorted"),
        count(lit(1)).as("n_sh"))
      // once sorted, the dfs are dead weight: the ARRAY ITSELF, in
      // rarest-first order, serves both roles — any prefix is a plain
      // slice of it (candidate generation joins the index by STRING).
      // Verification additionally gets `seth`: the same set as a SORTED
      // xxhash64 array, so the per-candidate intersection is a zero-
      // allocation two-pointer merge over longs (8 B shipped per shingle
      // instead of the string) — array_intersect rebuilt a hash set AND
      // allocated the intersection strings per candidate pair, the
      // dominant containment stage at sf0.1 (5.5 s of 12). 64-bit
      // collisions could in principle perturb a count (p ~ 1e-15 per
      // pair, deterministic per corpus); the oracle's exact string
      // recount would catch any.
      .select(col("doc_id"),
        expr("transform(sorted, s -> s.shingle)").as("set"),
        expr("sort_array(transform(sorted, s -> xxhash64(s.shingle)))")
          .as("seth"),
        col("n_sh"))

  /** Directed containment of `aDocs` (probe side) against the reference
    * `index`: (doc_a from aDocs, doc_b from index, |Sa ∩ Sb| / |Sa|).
    * Same lossless prefix filter and array-intersect verification as the
    * self-join query; the index side is never recomputed. */
  def containmentAgainst(
      index: ContainmentIndex, aDocs: DataFrame, threshold: Double,
      n: Int = 3): DataFrame =
    containmentCore(
      index, sortedSets(Dedup.docShingles(aDocs, n), index.df), threshold)

  private def containmentCore(
      index: ContainmentIndex, aSets0: DataFrame, threshold: Double): DataFrame = {
    // the probe side (a batch scored against a frozen index) is NOT
    // persisted by its builder, and this plan reads it three times
    // (guard accounting, candidate generation, verification) — persist
    // it here; the self-join side (aSets0 eq index.sets) is already
    // cached, so its slim projection recomputes cheaply and caching it
    // twice would only duplicate memory
    val self = aSets0 eq index.sets
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val aSets1 = {
      val s = aSets0.select(
        col("doc_id"),
        col("seth").as("ha"),
        col("n_sh"),
        // the prefix is threshold-dependent, so it stays a query-time
        // slice of the (already rarest-first) set array
        expr("slice(set, 1, " +
          s"cast(ceil(${1.0 - threshold} * n_sh) as int) + 1)").as("prefix"))
      if (self) s else s.persist(lvl)
    }
    try {
      val out = containmentGuarded(index, aSets1, self, threshold)
      // the probe path materializes before its cache is released below
      // (and before the finally runs on a guard abort); the self path
      // stays lazy — its callers cut at their own boundary and its
      // inputs are the index's own persisted frames
      if (self) out else Lineage.cut(out)
    } finally {
      if (!self) { aSets1.unpersist(); () }
    }
  }

  /** The containment guard's free self-join bound
    * ([[Dedup.budgetedBound]] over the shingle-df histogram with the
    * prefix-mass budget Σ prefixLen) — both inputs are aggregates over
    * frames the index already persists. Exposed for the probe that
    * sizes the default cap's headroom; ONE definition with the guard in
    * [[containmentGuarded]]. */
  private[graft] def containmentBudgetedBound(
      index: ContainmentIndex, threshold: Double): Double = {
    val budget = index.sets
      .agg(coalesce(sum(expr("cast(ceil(" +
        s"${1.0 - threshold} * n_sh) as int) + 1").cast("double")),
        lit(0.0))).head.getDouble(0)
    Dedup.budgetedBound(index.df.select(col("df")), budget)
  }

  private def containmentGuarded(
      index: ContainmentIndex, aSets: DataFrame, self: Boolean,
      threshold: Double): DataFrame = {
    // refuse-before-shuffle: candidate volume is Σ over PREFIX shingles
    // of np·(df-1) on the self-join path (np = prefix entries carrying
    // the shingle; each always matches its OWN posting too, and
    // counting self-matches would make the metric grow with corpus
    // size on a duplication-free corpus — see [[Dedup.tier1Bound]]) or
    // np·df on the probe path (a batch doc is not in the index, so
    // every posting is a real candidate). On the self-join path
    // np <= df, so the free budgeted bound applies
    // ([[Dedup.budgetedBound]]: hottest-first fill of the Σ prefixLen
    // budget — both inputs are scalar aggregates over frames the index
    // already persists; measured x10: 9.0e6, under the cap, zero
    // accounting jobs); only a tripped bound pays the exact
    // accounting, and only exact > cap aborts with the hot shingles
    // named. A probe batch's np is NOT bounded by the index df, so the
    // probe path accounts exactly — one narrow aggregation over the
    // (persisted) batch prefix, cheap at batch scale.
    val cap = Dedup.candidatePairCap(aSets.sparkSession)
    if (cap > 0) {
      val tripped = !self ||
        containmentBudgetedBound(index, threshold) > cap.toDouble
      if (tripped) {
        val fanout = if (self) col("df") - 1 else col("df")
        val perShingle = aSets
          .select(explode(col("prefix")).as("shingle"))
          .groupBy("shingle").agg(count(lit(1)).as("np"))
          .join(index.df, Seq("shingle"))
          .select(col("shingle"), (col("np") * fanout).as("p"))
        val total = perShingle.agg(coalesce(sum("p"), lit(0L)))
          .head.getLong(0)
        Dedup.enforceCandidateCap("containmentPairs", total, cap,
          perShingle.orderBy(col("p").desc).limit(5).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toSeq)
      }
    }
    // candidate generation: prefix shingles against the full inverted
    // index (recall 1 by the pigeonhole bound); candidate volume is
    // Σ over PREFIX shingles of df — hot shingles never enter a prefix
    // NOT broadcastIfSmall here (negative result, r22 — see
    // winnowNearDup): the eager materialize+count action costs more at
    // local scale than the verification shuffles it avoids
    val cand = aSets
      .select(col("doc_id").as("doc_a"), explode(col("prefix")).as("shingle"))
      .join(index.sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("shingle"))
      .where(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact directed verification on candidates only, via per-doc set
    // arrays: each candidate row carries two compact arrays and one
    // array_intersect — candidates are never re-exploded per shingle
    cand
      .join(aSets.select(col("doc_id").as("doc_a"), col("ha"),
        col("n_sh").as("na")), Seq("doc_a"))
      .join(index.sets.select(col("doc_id").as("doc_b"),
        col("seth").as("hb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        // the session must be the PROBE side's: under foreachBatch the
        // batch frame lives in the cloned streaming session, and that
        // clone's registry is what analyzes this plan — registering the
        // kernel into the index's (outer) session would leave it
        // unresolvable here. BARRIER-wrapped so the >=threshold filter
        // cannot substitute the two-pointer merge into the join
        // condition (2 kernel evaluations per candidate pair otherwise —
        // see Dedup.jaccardFor)
        (graft.functions.PlanBarrier(aSets.sparkSession,
          graft.functions.SortedIntersect(
            aSets.sparkSession, col("ha"), col("hb")).cast("double")) /
          col("na")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Eval-set decontamination: flag training documents sharing too much
    * n-gram material with a held-out benchmark/eval set. `evalFilter`
    * selects the eval docs; every other doc is scored by the fraction of
    * its distinct shingles that appear ANYWHERE in the eval set.
    *
    * Scale shape: eval sets are tiny relative to a 100 TB corpus, so the
    * distinct eval-shingle set BROADCASTS and scoring is one map-side
    * left-semi-style join + per-doc aggregate — the corpus never
    * self-joins. Output: (doc_id, n_sh, shared_sh, contam_frac,
    * contaminated). */
  def decontaminate(
      docs: DataFrame, evalFilter: org.apache.spark.sql.Column,
      maxFrac: Double = 0.3, n: Int = 3): DataFrame =
    decontaminateSh(Dedup.docShingles(docs, n), evalFilter, maxFrac)

  /** [[decontaminate]] from an already-exploded (doc_id, shingle) frame
    * (see [[boilerplateShImpl]]). Expressions verbatim. */
  private def decontaminateSh(
      sh: DataFrame, evalFilter: org.apache.spark.sql.Column,
      maxFrac: Double): DataFrame = {
    val evalSh = sh.where(evalFilter).select("shingle").distinct()
    sh.where(!evalFilter)
      .join(broadcast(evalSh.withColumn("__hit", lit(1))), Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_sh"),
        count(col("__hit")).as("shared_sh"))
      .select(
        col("doc_id"), col("n_sh"), col("shared_sh"),
        (col("shared_sh").cast("double") / col("n_sh")).as("contam_frac"),
        (col("shared_sh").cast("double") / col("n_sh") >= maxFrac).as("contaminated"))
  }

  /** Collect the distinct eval-set shingles driver-side: eval/benchmark
    * sets are tiny relative to any training corpus BY DEFINITION (that is
    * what makes the broadcast shape of [[decontaminate]] correct at
    * 100 TB), so this is the same bounded-collect pattern as quantizer
    * training samples. */
  def evalShingleSet(evalDocs: DataFrame, n: Int = 3): Seq[String] =
    Dedup.docShingles(evalDocs, n).select("shingle").distinct()
      .collect().map(_.getString(0)).toIndexedSeq

  /** STATELESS per-row decontamination scoring against a pre-collected
    * eval shingle set: the shingle kernel emits each doc's whole distinct
    * shingle set in its own row, so the score is one membership-count
    * kernel call per row — no explode, no shuffle, no aggregation, no
    * state. The same expression therefore runs identically on a batch
    * frame and on a STREAMING frame in append mode (dedup-on-ingest's
    * simpler sibling: contamination filtering while the corpus is being
    * ingested). Row-for-row equal to [[decontaminate]] over the non-eval
    * docs. The count uses [[graft.functions.SetCountHits]] (set built
    * once per executor) rather than array_intersect against a typedlit:
    * ArrayIntersect rebuilds the literal-side hash set on every row,
    * which at the x10 gate was the entire cost of the streaming query
    * (0.44 ms/row against a 2.2k-shingle eval set). */
  def decontaminateScore(
      docs: DataFrame, evalShingles: Seq[String], maxFrac: Double = 0.3,
      n: Int = 3): DataFrame = {
    val sh = graft.functions.TextKernels.shingleArray(
      docs.sparkSession, col("text"), n, distinct = true)
    docs
      .select(col("doc_id"), sh.as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(
        col("doc_id"),
        size(col("__sh")).cast("long").as("n_sh"),
        graft.functions.BloomMembership
          .countSetHits(docs.sparkSession, col("__sh"), evalShingles)
          .cast("long").as("shared_sh"))
      .select(
        col("doc_id"), col("n_sh"), col("shared_sh"),
        (col("shared_sh").cast("double") / col("n_sh")).as("contam_frac"),
        (col("shared_sh").cast("double") / col("n_sh") >= maxFrac).as("contaminated"))
  }

  /** Bloom-filter decontamination — the membership shape for when the
    * eval/benchmark shingle set outgrows an exact broadcast ([[
    * decontaminate]] ships every distinct eval shingle string to every
    * executor; fine for eval sets, but the same operator also covers
    * "filter a corpus against a BLOCKLIST corpus", where the reference
    * side can be millions of documents). The eval shingles are folded
    * DISTRIBUTED into a Bloom filter (partial filters OR-merged; only
    * the ~1.2 MB-per-million-items bitset reaches the driver and the
    * task closures), and each document is scored by one codegen'd
    * [[graft.functions.BloomCountHits]] pass over its distinct-shingle
    * array — no explode, no shuffle, no per-row set lookup allocation.
    *
    * Bloom guarantees NO false negatives, so `bloom_hits >=` the exact
    * shared-shingle count always, and overshoot is bounded by the false-
    * positive rate — both properties are pinned per-row/in-aggregate by
    * the self-validating gate query (q_decontaminate_bloom).
    * Output: (doc_id, n_sh, bloom_hits, contam_frac, contaminated). */
  def decontaminateBloom(
      docs: DataFrame, evalFilter: org.apache.spark.sql.Column,
      maxFrac: Double = 0.3, n: Int = 3, fpp: Double = 0.01): DataFrame = {
    val evalSh = Dedup.docShingles(docs.where(evalFilter), n)
      .select("shingle").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloomBytes = graft.functions.BloomMembership.build(
      evalSh, "shingle", evalSh.count(), fpp)
    evalSh.unpersist()
    val sh = graft.functions.TextKernels.shingleArray(
      docs.sparkSession, col("text"), n, distinct = true)
    docs.where(!evalFilter)
      .select(col("doc_id"), sh.as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(
        col("doc_id"),
        size(col("__sh")).cast("long").as("n_sh"),
        graft.functions.BloomMembership
          .countHits(docs.sparkSession, col("__sh"), bloomBytes)
          .cast("long").as("bloom_hits"))
      .select(
        col("doc_id"), col("n_sh"), col("bloom_hits"),
        (col("bloom_hits").cast("double") / col("n_sh")).as("contam_frac"),
        (col("bloom_hits").cast("double") / col("n_sh") >= maxFrac)
          .as("contaminated"))
  }

  /** Containment-on-ingest: score each ARRIVING document's directed
    * containment against a static reference corpus, one microbatch at a
    * time through `foreachBatch` — the per-batch plan is exactly
    * [[containmentAgainst]] (prefix candidates + array-intersect verify)
    * with every index-side frame persisted once outside the stream.
    * Batching-invariant by construction: each arriving doc is scored
    * against the full static index regardless of which batch carries it.
    * Drains the stream (AvailableNow) and returns the appended result. */
  def containmentOnIngest(
      streamDocs: DataFrame, index: ContainmentIndex, threshold: Double,
      n: Int = 3): DataFrame =
    graft.streaming.StreamingOps.runBatchesToParquet(
      streamDocs, "stream_containment",
      batch => containmentAgainst(index, batch, threshold, n))

  /** Deterministic stratified sample: exactly `perGroup` docs per value of
    * `groupCol` (fewer only if the group is smaller), chosen by md5(text)
    * order so the choice is stable across runs and engines.
    *
    * Scale shape (the naive rank-all-rows window sorts EVERY group member):
    * phase 1 prefilters each group by a 16-bit hash prefix bound sized at
    * ~4x the needed rate from the (broadcast, one-row-per-group) counts, so
    * phase 2's per-group window ranks only ~4*perGroup survivors. The
    * oracle applies the identical integer bound, so even the (vanishingly
    * rare) under-sampled-group case matches exactly.
    * Output: (doc_id, <groupCol>, rn). */
  def stratifiedSample(
      docs: DataFrame, groupCol: String, perGroup: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("cnt"))
    val bound = least(
      lit(65535),
      ceil(lit(65536.0 * 4 * perGroup) / col("cnt")).cast("int"))
    docs.join(broadcast(counts), groupCol)
      .where(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") < bound)
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(md5(col("text")), col("doc_id"))))
      .where(col("rn") <= perGroup)
      .select(col("doc_id"), col(groupCol), col("rn"))
  }

  /** Email + NANP-style phone regexes, in Spark and DuckDB spellings (the
    * dialects agree on this subset; DuckDB just needs the 'g' flag to
    * replace globally, which Spark does by default). */
  /** The full corpus-hygiene pipeline as ONE composed query — what a
    * training-data build actually runs: language-ID -> quality floor ->
    * boilerplate filter -> exact dedup -> eval-set decontamination ->
    * repetition floors (word-level Gopher rules AND char-fraction rules)
    * -> trigram-LM corpus-fit floor -> PII redaction -> budget-
    * constrained quality selection as the FINAL stage, emitting one row
    * per SELECTED document with every stage's evidence (scores, ratios,
    * cumulative token position, redacted fingerprint). Stages are the
    * individually-oracled operators above ([[boilerplate]],
    * [[decontaminate]], [[repetitionScore]],
    * [[TextOps.repetitionSignals]], [[TextOps.trigramRareRate]],
    * [[MixOps.selectUnderBudget]]), composed so the judge of any single
    * stage is also the judge of the composition.
    *
    * Plan shape: language scores, token counts, and the redaction
    * fingerprint are projections fused into the scan (no exchange);
    * boilerplate adds its two hash-keyed shuffles; dedup survivors are
    * one fingerprint aggregation consumed as a left-semi join;
    * decontamination broadcasts the eval shingle set; the char-fraction
    * repetition signals are one kernel call per row; the trigram model
    * aggregates over bounded distinct-trigram keys and scores map-side.
    * Everything joins back on doc_id — at scale these collapse into one
    * doc_id-keyed exchange under AQE. The hygiene survivor set is
    * materialized once ([[Lineage.cut]]) because the budget stage
    * consumes it twice (token totals + final join). The boilerplate df
    * floor is FRACTIONAL (max(3, 1% of corpus)) — an absolute df cutoff
    * silently reclassifies the whole corpus as boilerplate as the corpus
    * grows, which is exactly the kind of 100x-scale defect the x10 gate
    * exists to catch.
    *
    * Threshold calibration on the synthetic corpus
    * ([[graft.tools.SignalStats]]): uniq_ratio p50 is 0.45 (word-salad
    * text), so the pipeline floor is 0.3, NOT q_repetition's standalone
    * 0.5 keep rule; dup3_frac caps at 0.2 (p99 = 0.13, max 0.41 — only
    * the degenerate tail drops); rare_rate caps at 0.2 (corpus max 0.12;
    * gibberish spikes far past it).
    *
    * Output: (doc_id, n_tokens, stop_ratio, boiler_ratio, contam_frac,
    * uniq_ratio, top_bigram_frac, dup3_frac, rare_rate, cum_tokens,
    * red_fp) for documents passing every stage AND selected under the
    * token budget. */
  def hygienePipeline(
      docs: DataFrame, evalFilter: org.apache.spark.sql.Column,
      lang: String = "en", minTokens: Long = 20, minStopRatio: Double = 0.02,
      maxBoilerRatio: Double = 0.3, maxContamFrac: Double = 0.3,
      maxTopBigramFrac: Double = 0.2, minUniqRatio: Double = 0.3,
      maxDup3Frac: Double = 0.2, maxRareRate: Double = 0.2,
      tokenBudget: Long = 10000L): DataFrame = {
    // one spread at the pipeline entry: every per-row stage below scans
    // the corpus with heavy regex/kernel projections, which otherwise run
    // at the (single-task, for a local single-row-group file) scan
    // parallelism; sub-operators' own spread then no-ops
    val d = Dedup.spread(docs)
    // ONE fused scan computes every signal that depends only on
    // (doc_id, text) — langid scores, token count, PII fingerprint,
    // unique-token ratio, repetition kernel, trigram-LM fit — replacing
    // the four separate scans (scored/rep-perRow/chars/fit) and their
    // three doc_id joins the previous formulation paid. Each expression
    // is byte-identical to its standalone operator's; the trailing
    // filter reproduces the exact row-drop semantics the inner joins
    // had (repetitionSignals drops null-kernel rows, trigramScoreAgainst
    // drops trigram-less rows, repetitionScore's perRow drops
    // sub-2-token rows). Corpus-level branches (shingle-df boilerplate,
    // eval-set decontamination, the bigram-mode aggregation, exact-dup
    // survivors) keep their own shuffles below.
    val scored = fusedPerRowSignals(d, TextOps.trigramCommonSet(d))
    // ONE shared shingle scan feeds the three corpus-level branches:
    // boilerplate consumes the 3-shingle rows twice (df aggregate + the
    // per-doc join back), decontamination twice (eval set + scoring),
    // and the bigram mode reads the 2-shingle rows — previously FIVE
    // independent corpus scans each re-running the tokenize+shingle
    // regex kernel. The per-doc arrays persist once; every branch
    // explodes from cache. Same kernels, same args, so each branch's
    // rows are byte-identical to its standalone operator's.
    val spark = d.sparkSession
    val shFrame = d.select(col("doc_id"),
      graft.functions.TextKernels.shingleArray(
        spark, col("text"), 3, distinct = true).as("__sh3"),
      graft.functions.TextKernels.shingleArray(
        spark, col("text"), 2, distinct = false).as("__sh2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh3 = shFrame.select(col("doc_id"), explode(col("__sh3")).as("shingle"))
    val nDocs = broadcast(d.agg(count(lit(1)).as("__n_docs")))
    val minDfCol = greatest(
      lit(3L), ceil(lit(0.01) * col("__n_docs")).cast("long"))
    val boil = boilerplateShImpl(
        sh3, _.crossJoin(nDocs), minDfCol, maxBoilerRatio)
      .select(col("doc_id"), col("boiler_ratio"), col("keep").as("__b_keep"))
    val survivors = d
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("__f"))
      .groupBy("__f").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val decon = decontaminateSh(sh3, evalFilter, maxContamFrac)
      .select(col("doc_id"), col("contam_frac"), col("contaminated"))
    val top = bigramTopFracSh(
      shFrame.select(col("doc_id"), explode(col("__sh2")).as("b")))
    val hygiene = Lineage.cut(scored
      .join(boil, Seq("doc_id"))
      .join(decon, Seq("doc_id"))
      .join(top, Seq("doc_id"))
      .join(survivors, Seq("doc_id"), "left_semi")
      .where(col("predicted") === lang && col("n_tokens") >= minTokens &&
        col("n_stop").cast("double") / col("n_tokens") >= minStopRatio &&
        col("__b_keep") && !col("contaminated") &&
        col("top_bigram_frac") <= maxTopBigramFrac &&
        col("uniq_ratio") >= minUniqRatio &&
        col("dup3_frac") <= maxDup3Frac &&
        col("rare_rate") <= maxRareRate)
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        col("boiler_ratio"), col("contam_frac"), col("uniq_ratio"),
        col("top_bigram_frac"), col("dup3_frac"), col("rare_rate"),
        col("red_fp")))
    // the cut above materialized every consumer of the shared shingle
    // frame; the budget stage below reads only d and the cut survivors
    shFrame.unpersist()
    val selected = MixOps.selectUnderBudget(
        d.join(hygiene.select("doc_id"), Seq("doc_id"), "left_semi"),
        tokenBudget)
      .where(col("selected"))
      .select(col("doc_id"), col("cum_tokens"))
    hygiene.join(selected, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_tokens"), col("stop_ratio"),
        col("boiler_ratio"), col("contam_frac"), col("uniq_ratio"),
        col("top_bigram_frac"), col("dup3_frac"), col("rare_rate"),
        col("cum_tokens"), col("red_fp"))
  }

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** The fused per-row hygiene stage shared by [[hygienePipeline]] and
    * [[hygieneScore]]: one scan/projection computes every signal that
    * depends only on (doc_id, text). Expressions are copied verbatim
    * from the standalone operators (TextOps.matchCount langid scores,
    * repetitionScore's uniq_ratio, repetitionSignals' dup3_frac,
    * trigramScoreAgainst's rare_rate, the PII-redact md5), so each value
    * is byte-identical; the trailing filter reproduces the row-drop
    * semantics of the inner joins this fusion replaces (null repetition
    * kernel, trigram-less doc, < 2 tokens). With `evalShingles` set,
    * also computes decontaminateScore's per-row columns (the streaming
    * profile form) including its empty-shingle-set drop. Expensive
    * kernel projections are PlanBarrier-wrapped so no filter re-derives
    * them below the spread exchange (see PlanBarrier). */
  private def fusedPerRowSignals(
      d: DataFrame, commonTrigrams: Seq[String],
      evalShingles: Option[(Seq[String], Double)] = None): DataFrame = {
    val spark = d.sparkSession
    val toks = TextOps.tokens(col("text"))
    val deconCols = evalShingles.toSeq.map { _ =>
      graft.functions.PlanBarrier(spark, graft.functions.TextKernels
        .shingleArray(spark, col("text"), 3, distinct = true)).as("__sh")
    }
    val base = TextOps.LangStopwords.foldLeft(d) {
      case (df2, (l, pat)) =>
        df2.withColumn(s"s_$l", TextOps.matchCount(col("text"), pat))
    }.select(Seq(
      col("doc_id"),
      col("s_en"), col("s_de"), col("s_fr"), col("s_es"),
      graft.functions.PlanBarrier(spark, size(toks).cast("long"))
        .as("n_tokens"),
      md5(regexp_replace(
        regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("red_fp"),
      (size(array_distinct(toks)).cast("double") / size(toks))
        .as("uniq_ratio"),
      graft.functions.PlanBarrier(spark, graft.functions.TextKernels
        .repetitionStatsCol(spark, col("text"))).as("__r"),
      graft.functions.PlanBarrier(spark, graft.functions.TextKernels
        .charNgramArray(spark, col("text"), 3)).as("__tris")) ++ deconCols: _*)
    val withDecon = evalShingles match {
      case None => base
      case Some((shingles, maxFrac)) =>
        base
          .withColumn("n_sh", size(col("__sh")).cast("long"))
          .withColumn("shared_sh", graft.functions.BloomMembership
            .countSetHits(spark, col("__sh"), shingles).cast("long"))
          .withColumn("contam_frac",
            col("shared_sh").cast("double") / col("n_sh"))
          .withColumn("contaminated",
            col("shared_sh").cast("double") / col("n_sh") >= maxFrac)
    }
    val deconFilter = evalShingles match {
      case None => lit(true)
      case Some(_) => size(col("__sh")) > 0
    }
    withDecon
      .withColumn("predicted",
        when(col("s_en") === 0 && col("s_de") === 0 && col("s_fr") === 0 && col("s_es") === 0, "other")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .withColumn("n_stop", col("s_en"))
      .withColumn("dup3_frac",
        col("__r.dup3_chars").cast("double") / col("__r.alpha_chars"))
      .withColumn("n_tri", size(col("__tris")).cast("long"))
      .withColumn("n_rare",
        (size(col("__tris")) - graft.functions.BloomMembership
          .countSetHits(spark, col("__tris"), commonTrigrams)).cast("long"))
      .withColumn("rare_rate",
        col("n_rare").cast("double") / col("n_tri"))
      .where(col("__r").isNotNull && size(col("__tris")) > 0 &&
        col("n_tokens") >= 2 && deconFilter)
      .drop("s_de", "s_fr", "s_es", "__r", "__tris", "__sh",
        "n_tri", "n_rare")
  }

  /** repetitionScore's top-bigram-mode branch, standalone: the one
    * per-row hygiene signal that genuinely needs a shuffle (true
    * per-(doc, bigram) counts). Expressions verbatim from
    * [[repetitionScore]]. */
  private def bigramTopFrac(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    bigramTopFracSh(Dedup.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels.shingleArray(
          spark, col("text"), 2, distinct = false)).as("b")))
  }

  /** [[bigramTopFrac]] from an already-exploded (doc_id, b) bigram frame
    * (see [[boilerplateShImpl]]). Expressions verbatim. */
  private def bigramTopFracSh(bi: DataFrame): DataFrame = {
    bi
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top"), sum(col("c")).as("tot"))
      .select(col("doc_id"),
        (col("top").cast("double") / col("tot")).as("top_bigram_frac"))
  }

  /** Frozen corpus profile for ON-INGEST hygiene scoring: the corpus-wide
    * statistics every per-document stage needs, computed ONCE from a
    * reference corpus and reused for every arriving batch — shingle
    * document frequencies (boilerplate), the eval shingle set
    * (decontamination), the common-trigram set (LM fit), and the
    * fractional boilerplate df floor pinned to the REFERENCE corpus size
    * (an arriving batch must not move the floor). Callers `release()`
    * when done. */
  final case class HygieneProfile(
      refDf: DataFrame, evalShingles: Seq[String],
      commonTrigrams: Seq[String], minDf: Long) {
    def release(): Unit = { refDf.unpersist(); () }
  }

  def buildHygieneProfile(
      refDocs: DataFrame,
      evalFilter: org.apache.spark.sql.Column): HygieneProfile = {
    val refDf = shingleDf(refDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    HygieneProfile(
      refDf,
      evalShingleSet(refDocs.where(evalFilter)),
      TextOps.trigramCommonSet(refDocs),
      math.max(3L, math.ceil(0.01 * refDocs.count()).toLong))
  }

  /** Per-document hygiene scoring against a frozen [[HygieneProfile]] —
    * the stages of [[hygienePipeline]] that depend only on (document,
    * corpus profile): language-ID, token/stopword floors, boilerplate
    * fraction vs the reference df table, eval-set decontamination,
    * word + char-fraction repetition floors, trigram-LM fit, PII
    * fingerprint. The corpus-STATE stages (exact-dedup survivors, the
    * token-budget cumsum) are inherently cross-document and stay batch
    * ([[hygienePipeline]]); everything here is per-row or
    * batch-vs-static, so the same function scores a batch frame and
    * every streaming microbatch identically. Output: one row per
    * SURVIVING document with all stage evidence. */
  def hygieneScore(
      profile: HygieneProfile, docs: DataFrame, lang: String = "en",
      minTokens: Long = 20, minStopRatio: Double = 0.02,
      maxBoilerRatio: Double = 0.3, maxContamFrac: Double = 0.3,
      maxTopBigramFrac: Double = 0.2, minUniqRatio: Double = 0.3,
      maxDup3Frac: Double = 0.2, maxRareRate: Double = 0.2): DataFrame = {
    // same entry spread as hygienePipeline: a streaming microbatch frame
    // arrives with the source's (often single) partitioning
    val d = Dedup.spread(docs)
    // same fusion as hygienePipeline, plus decontaminateScore's per-row
    // columns (streaming decon scores against the frozen eval set, so it
    // fuses too — only the boilerplate-vs-reference join and the bigram
    // mode keep their shuffles)
    val scored = fusedPerRowSignals(d, profile.commonTrigrams,
      evalShingles = Some((profile.evalShingles, maxContamFrac)))
    val boil = boilerplateAgainst(profile.refDf, d, profile.minDf, maxBoilerRatio)
      .select(col("doc_id"), col("boiler_ratio"), col("keep").as("__b_keep"))
    val top = bigramTopFrac(d)
    scored
      .join(boil, Seq("doc_id"))
      .join(top, Seq("doc_id"))
      .where(col("predicted") === lang && col("n_tokens") >= minTokens &&
        col("n_stop").cast("double") / col("n_tokens") >= minStopRatio &&
        col("__b_keep") && !col("contaminated") &&
        col("top_bigram_frac") <= maxTopBigramFrac &&
        col("uniq_ratio") >= minUniqRatio &&
        col("dup3_frac") <= maxDup3Frac &&
        col("rare_rate") <= maxRareRate)
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        col("boiler_ratio"), col("contam_frac"), col("uniq_ratio"),
        col("top_bigram_frac"), col("dup3_frac"), col("rare_rate"),
        col("red_fp"))
  }

  /** Hygiene-on-ingest: score every ARRIVING document against the frozen
    * corpus profile, one microbatch at a time — the deployment form of
    * the corpus build, where the profile is computed once from the
    * existing corpus and new crawl data is filtered continuously against
    * it. Batching-invariant by construction: every stage is per-row or
    * batch-vs-static, so any carve-up of arrivals scores identically
    * (pinned to the batch [[hygieneScore]] by the q_stream_pipeline
    * oracle). Drains with AvailableNow and returns the appended rows. */
  def hygieneOnIngest(
      streamDocs: DataFrame, profile: HygieneProfile): DataFrame =
    graft.streaming.StreamingOps.runBatchesToParquet(
      streamDocs, "stream_hygiene",
      batch => hygieneScore(profile, batch))

  /** Within-document repetition scoring (the Gopher-style quality rules
    * that catch degenerate/templated text): unique-token ratio, the
    * fraction of all bigram occurrences taken by the single most frequent
    * bigram, and the duplicated-chunk ratio inside the document. A doc
    * dominated by one repeated phrase scores top_bigram_frac near 1 and
    * is dropped; hygiene filters keyed on CROSS-doc frequency
    * ([[boilerplate]], [[chunkDedup]]) cannot see this.
    *
    * Scale shape: unique-token and dup-chunk ratios are pure per-row
    * array expressions fused into the scan (zero exchange); the top-
    * bigram mode needs true per-(doc, bigram) counts, so it shuffles
    * twice on hash keys (doc_id+bigram, then doc_id) — never on text.
    * Output: (doc_id, n_tokens, uniq_ratio, top_bigram_frac,
    * dup_chunk_ratio, keep). */
  def repetitionScore(
      docs: DataFrame, maxTopBigramFrac: Double = 0.2,
      minUniqRatio: Double = 0.5, chunkK: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    val toks = TextOps.tokens(col("text"))
    val chunks = graft.functions.TextKernels.chunkArray(spark, col("text"), chunkK)
    // n_tokens is barrier-wrapped so the >=2 filter stays above this
    // projection instead of re-running the tokenizer in the scan below
    // the spread exchange
    val perRow = Dedup.spread(docs)
      .select(
        col("doc_id"),
        graft.functions.PlanBarrier(spark, size(toks).cast("long")).as("n_tokens"),
        (size(array_distinct(toks)).cast("double") / size(toks)).as("uniq_ratio"),
        (lit(1.0) - size(array_distinct(chunks)).cast("double") / size(chunks))
          .as("dup_chunk_ratio"))
      .where(col("n_tokens") >= 2)
    val bg = Dedup.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.TextKernels.shingleArray(
          spark, col("text"), 2, distinct = false)).as("b"))
    val top = bg.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max(col("c")).as("top"), sum(col("c")).as("tot"))
      .select(col("doc_id"),
        (col("top").cast("double") / col("tot")).as("top_bigram_frac"))
    perRow.join(top, Seq("doc_id"))
      .select(
        col("doc_id"), col("n_tokens"), col("uniq_ratio"),
        col("top_bigram_frac"), col("dup_chunk_ratio"),
        (col("top_bigram_frac") <= maxTopBigramFrac &&
          col("uniq_ratio") >= minUniqRatio).as("keep"))
  }

  /** Per-domain corpus census + blocklist filtering — the URL-level
    * hygiene every crawl-derived corpus runs first. The synthetic corpus
    * has no URLs, so (as with [[redactDemo]]'s PII) each doc carries a
    * DETERMINISTIC injected source URL derived from doc_id; the
    * extraction/normalization/blocklist expressions are exactly what
    * runs on real crawl text. Pure projection + one count aggregation
    * over ~|domains| keys. Output: (domain, n_docs, blocked). */
  def urlDomainStats(docs: DataFrame, blocklist: Seq[String]): DataFrame =
    docs
      .select(concat(
        lit("see http://site"), pmod(col("doc_id"), lit(50)).cast("string"),
        lit(".example.com/p/"), col("doc_id").cast("string"),
        lit(" "), col("text")).as("t"))
      .select(regexp_extract(col("t"), UrlDomainRe, 1).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"))
      .select(col("domain"), col("n_docs"),
        col("domain").isInCollection(blocklist).as("blocked"))

  val UrlDomainRe = "https?://([a-z0-9.-]+)/"

  /** PII redaction: count and mask email addresses and phone numbers. The
    * corpus is synthetic word-salad with no real PII, so the op
    * demonstrates on DETERMINISTIC injected contact lines (derived from
    * doc_id — identical on the oracle side); the redaction expressions
    * themselves are exactly what runs on real text. Pure projection — no
    * shuffle, embarrassingly parallel at any scale.
    * Output: (doc_id, n_emails, n_phones, red_fp = md5(redacted text)). */
  def redactDemo(docs: DataFrame): DataFrame = {
    val injected = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    docs
      .select(col("doc_id"), injected.as("t"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(regexp_replace(
          regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("red_fp"))
  }
}
