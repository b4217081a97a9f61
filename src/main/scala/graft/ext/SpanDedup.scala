package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication (SURVEY.md §2.9 dedup family):
  * find every maximal token span that occurs more than once ANYWHERE in
  * the corpus (another document or another offset of the same document)
  * and remove it, keeping the surrounding text — the span-level exact
  * dedup of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL 2022), where the unit of removal is the repeated
  * substring itself rather than the whole document or a fixed chunk.
  *
  * Method (token-level, window `w`): every w-token gram is keyed by
  * position; a position is DUPLICATED when its gram occurs >= 2 times
  * corpus-wide; runs of duplicated positions closer than `w` merge into
  * one maximal span [start, start_of_last_window + w - 1] (two windows at
  * p < q overlap or adjoin exactly when q - p <= w, so islands split on
  * gaps > w). By construction every token of a span lies inside SOME
  * duplicated window, spans are disjoint, and any repeat of length >= w
  * is found (a repeat shorter than w is invisible — the same floor as
  * the reference method's min-match length).
  *
  * Scale shape (the suffix-array of the paper is replaced by the shuffle
  * primitives a cluster engine is good at):
  *   1. gram construction is one map-side codegen kernel pass
  *      ([[graft.functions.TextKernels]] shingles) — no exchange;
  *   2. the corpus-wide duplicate test groups by xxhash64(gram), so the
  *      shuffle carries (hash, doc_id, pos) ~ 24 bytes per token
  *      REGARDLESS of w — gram strings never leave the map side; the
  *      aggregate is map-side-combined and the duplicated-key set comes
  *      back through a semi join on the same key (AQE reuses the
  *      exchange);
  *   3. island-merge is one window over (doc_id, pos) — the only
  *      doc-keyed shuffle, bounded by the marked-position count;
  *   4. span removal is a per-doc projection: the doc's sorted span
  *      array (one tiny aggregation, broadcast-joined 1:1) meets its
  *      token array in an O(tokens + spans) merge-walk kernel
  *      ([[graft.functions.SpanRemoveJoin]]) — no token-level shuffle,
  *      and no per-doc quadratic residual.
  * With `hashGrams = true` (default) a 64-bit collision can falsely mark
  * a position: expected colliding PAIRS ~ n_grams^2 / 2^65 — ~0 below
  * 10^9 grams and a ~5e-7 fraction of marked positions at 100 TB scale
  * (acceptable dedup noise; the paper's own pipeline tolerates
  * approximate matches). `hashGrams = false` groups by the gram string
  * itself (exact, wider shuffle); SpanDedupSpec asserts both paths agree
  * on the test corpus.
  */
object SpanDedup {

  /** (doc_id, pos, gkey) positional w-gram keys — one map-side kernel
    * pass, hashed by default so the key is fixed-width. */
  private def grams(docs: DataFrame, w: Int, hashGrams: Boolean): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(graft.functions.TextKernels.shingleArray(
          docs.sparkSession, col("text"), w, distinct = false))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"),
        (if (hashGrams) xxhash64(col("gram")) else col("gram")).as("gkey"))

  /** Marked positions -> disjoint maximal spans (gap > w splits). */
  private def spansFromMarked(marked: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > w, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (w - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Per-doc result: token totals, span stats, and the md5 of the
    * span-REMOVED text (pins exact span boundaries). One row per doc of
    * `docs`, including documents with no span. */
  private def statsWithCleanFp(docs: DataFrame, spans: DataFrame): DataFrame = {
    // span stats AND the position-sorted span array come from ONE
    // aggregation of the (tiny, already materialized) span rows; the
    // aggregated side broadcasts into the doc join
    val spanArr = spans.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"),
        sort_array(collect_list(struct(
          col("span_start").cast("int").as("s"),
          col("span_end").cast("int").as("e")))).as("sp"))
    // ONE projection per document: tokenize once, strip spans with the
    // O(tokens + spans) merge walk ([[graft.functions.SpanRemoveJoin]]).
    // The former tokpos explode + doc_id-keyed range anti join +
    // collect_list re-assembly reshuffled every kept token row AND
    // evaluated tokens x spans residual comparisons inside each doc's
    // task — the one super-linear stage this operator had (a degenerate
    // corpus makes spans_d ~ tokens_d / w). With it gone, every
    // span-dedup stage is output-linear: gram semi-join <= gram rows,
    // island window <= marked rows, this projection = one row per doc —
    // which is why the operator needs no candidate-volume guard.
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("total_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        md5(when(col("sp").isNull, array_join(col("toks"), " "))
          .otherwise(graft.functions.SpanRemove(
            docs.sparkSession, col("toks"), col("sp")))).as("clean_fp"))
  }

  /** Maximal duplicated token spans: (doc_id, span_start, span_end)
    * in 0-based token positions, end inclusive. */
  def duplicateSpans(docs: DataFrame, w: Int = 8,
      hashGrams: Boolean = true): DataFrame = {
    val g = grams(Dedup.spread(docs), w, hashGrams)
    val dupKeys = g.groupBy("gkey").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("gkey")
    val marked = g.join(dupKeys, Seq("gkey"), "left_semi")
      .select("doc_id", "pos")
    spansFromMarked(marked, w)
  }

  /** Per-document span-dedup result over the whole corpus: token totals,
    * span counts, duplicated-token counts, and an md5 fingerprint of the
    * span-REMOVED text (tokens outside every span, space-joined) — the
    * fingerprint pins the exact span boundaries, so any off-by-one in
    * island merging or removal changes the hash. One row per input
    * document, including documents with no duplicated span
    * (n_spans = 0, clean_fp = md5 of the full token join). */
  def spanDedup(docs: DataFrame, w: Int = 8,
      hashGrams: Boolean = true): DataFrame = {
    val spans = Lineage.cut(duplicateSpans(docs, w, hashGrams))
    statsWithCleanFp(docs, spans)
  }

  /** Frozen corpus side of span-dedup-on-ingest: the DISTINCT gram keys
    * of the reference corpus. Built once and reused by every arriving
    * batch — at 100 TB this is a keyed frame (joined, never broadcast),
    * ~one fixed-width key per distinct corpus w-gram. */
  final case class GramIndex(keys: DataFrame, w: Int, hashGrams: Boolean) {
    def release(): Unit = { keys.unpersist(); () }
  }

  def buildGramIndex(corpus: DataFrame, w: Int = 8,
      hashGrams: Boolean = true): GramIndex =
    GramIndex(
      grams(Dedup.spread(corpus), w, hashGrams).select("gkey").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      w, hashGrams)

  /** Span-dedup an arriving batch AGAINST a frozen corpus: a position is
    * duplicated when its gram exists ANYWHERE in the reference corpus
    * (one corpus occurrence + the arrival = a repeat). Scores each doc
    * against the static gram set only — intra-batch repeats are
    * deliberately NOT consulted, so the result is batching-invariant
    * (the crawl-loop composition that ALSO catches batch-internal dups
    * is [[duplicateSpans]] over the batch, unioned). */
  def spanDedupAgainst(index: GramIndex, batch: DataFrame): DataFrame = {
    val g = grams(batch, index.w, index.hashGrams)
    val marked = g.join(index.keys, Seq("gkey"), "left_semi")
      .select("doc_id", "pos")
    statsWithCleanFp(batch, Lineage.cut(spansFromMarked(marked, index.w)))
  }

  /** Streaming form: every arriving microbatch is span-scored against
    * the frozen corpus gram index ([[spanDedupAgainst]] per batch). */
  def spanDedupOnIngest(streamDocs: DataFrame, index: GramIndex): DataFrame =
    graft.streaming.StreamingOps.runBatchesToParquet(
      streamDocs, "stream_span_dedup",
      batch => spanDedupAgainst(index, batch))

  /** Persist the frozen gram index — the build-once/probe-many disk
    * layout ([[DedupIndex]]/[[IvfIndex]] pattern) for the recurring-crawl
    * deployment: keys land hash-partitioned 16 ways and sorted, so the
    * per-batch membership semi-join shuffles only the (much smaller)
    * batch side against a layout that never recomputes; one-row meta
    * sidecar pins (w, hashGrams) so probes can never band differently
    * than the build. */
  def saveGramIndex(index: GramIndex, path: String): Unit = {
    val spark = index.keys.sparkSession
    index.keys
      .withColumn("gp", pmod(xxhash64(col("gkey")), lit(16)).cast("int"))
      .repartition(col("gp")).sortWithinPartitions("gkey")
      .write.mode("overwrite").partitionBy("gp").parquet(s"$path/keys")
    import spark.implicits._
    Seq((index.w, index.hashGrams)).toDF("w", "hash_grams")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadGramIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): GramIndex = {
    val m = spark.read.parquet(s"$path/meta").collect().head
    GramIndex(spark.read.parquet(s"$path/keys").select("gkey"),
      m.getInt(0), m.getBoolean(1))
  }

  /** Grow the persisted index with a batch's grams (the crawl loop's
    * "remember what we've seen" step): the batch's DISTINCT keys append
    * into the same partition layout — duplicates against existing keys
    * are harmless (membership is a semi-join), so no read-before-write;
    * probes see the new grams at their next file listing. */
  def appendToGramIndex(path: String, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val m = spark.read.parquet(s"$path/meta").collect().head
    grams(Dedup.spread(batch), m.getInt(0), m.getBoolean(1))
      .select("gkey").distinct()
      .withColumn("gp", pmod(xxhash64(col("gkey")), lit(16)).cast("int"))
      .repartition(col("gp")).sortWithinPartitions("gkey")
      .write.mode("append").partitionBy("gp").parquet(s"$path/keys")
  }
}
