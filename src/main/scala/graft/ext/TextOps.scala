package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline extension surface
  * (SURVEY.md §2.9): tokenization, n-gram shingles, language-ID scoring,
  * quality features, fingerprints. All are pure column expressions
  * (codegen-friendly, no UDFs) with exact DuckDB-SQL equivalents.
  */
object TextOps {

  val TokenPattern = "[a-z0-9]+"

  /** Lowercased word tokens. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  /** Word n-gram shingles of a token array (empty when < n tokens; note
    * Spark's sequence(1, k) counts DOWN when k < 1, so the guard is
    * mandatory for parity with engines whose range() returns empty). */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Count of matches of a regex in lowercased text, as LONG (DuckDB's
    * len() is BIGINT; Spark's size() is INT — cast for schema parity). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0))).cast("long")

  /** Stopword regexes per language for the n-gram language-ID heuristic. */
  val LangStopwords: Seq[(String, String)] = Seq(
    "en" -> "\\b(?:the|and|of|to|in)\\b",
    "de" -> "\\b(?:der|die|und|das|ist)\\b",
    "fr" -> "\\b(?:le|la|et|les|des)\\b",
    "es" -> "\\b(?:el|los|y|que|una)\\b")

  /** Same regexes in DuckDB-SQL spelling (single backslash). */
  val LangStopwordsSql: Seq[(String, String)] = LangStopwords.map {
    case (l, p) => l -> p.replace("\\\\", "\\")
  }

  /** Content fingerprint: md5 of whitespace-normalized lowercased text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Vocabulary coverage / out-of-vocabulary scoring — the tokenizer-
    * coverage check a pretraining pipeline runs before committing to a
    * vocab: build the top-`vocabSize` tokens by corpus frequency
    * (deterministic ties by token), then score every document's OOV
    * token rate against it.
    *
    * Scale shape: the vocab build is one token-count aggregation topped
    * by TakeOrderedAndProject (no global sort; only `vocabSize` rows
    * reach the driver — same bounded-collect pattern as quantizer
    * training), and scoring is one [[graft.functions.SetCountHits]]
    * pass per document over its token array — membership against the
    * broadcast vocab set, no explode, no second shuffle. All counts are
    * integers; oov_rate is one exact division.
    * Output: (doc_id, n_tokens, n_oov, oov_rate). */
  def vocabCoverage(
      docs: org.apache.spark.sql.DataFrame, vocabSize: Int)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
    val vocab = toks
      .select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(vocabSize)
      .collect().map(_.getString(0)).toIndexedSeq
    toks
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) -
          graft.functions.BloomMembership
            .countSetHits(spark, col("toks"), vocab))
          .cast("long").as("n_oov"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** Gopher/MassiveText-style repetition signals per document: the char
    * fraction covered by the single most frequent word 2-gram and by all
    * duplicated word 3-grams — the filters a pretraining pipeline uses
    * to drop boilerplate-looping and degenerate-repetition documents.
    *
    * Scale shape: the whole computation is ONE codegen'd kernel call per
    * row ([[graft.functions.RepetitionStatsExpr]] — the n-gram frequency
    * maps live in the kernel, not the plan), so there is no explode, no
    * shuffle, and no window; the operator is a pure projection at any
    * corpus size. Counts stay integer; each fraction is one exact
    * int-product cast and one IEEE division, so the relational oracle
    * hash-matches. Documents with < 3 tokens (no 3-gram) are dropped.
    * Output: (doc_id, n_tokens, alpha_chars, top2_gram, top2_cnt,
    * top2_frac, dup3_chars, dup3_frac). */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    // the kernel projection is barrier-wrapped so the isNotNull filter
    // cannot be substituted through it into the single-task scan below
    // the spread exchange (one kernel evaluation, at shuffle parallelism)
    Dedup.spread(docs)
      .select(col("doc_id"),
        graft.functions.PlanBarrier(spark, graft.functions.TextKernels
          .repetitionStatsCol(spark, col("text"))).as("r"))
      .where(col("r").isNotNull)
      .select(
        col("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        col("r.alpha_chars").as("alpha_chars"),
        col("r.top2_gram").as("top2_gram"),
        col("r.top2_cnt").as("top2_cnt"),
        ((col("r.top2_cnt") * (length(col("r.top2_gram")) - 1)).cast("double")
          / col("r.alpha_chars")).as("top2_frac"),
        col("r.dup3_chars").as("dup3_chars"),
        (col("r.dup3_chars").cast("double") / col("r.alpha_chars"))
          .as("dup3_frac"))
  }

  /** Character-trigram language-model scoring (the CCNet-style corpus-
    * fit filter, made engine-portable): every document is scored by the
    * fraction of its trigram POSITIONS whose trigram is rare in the
    * corpus — rare meaning relative frequency <= 1/relDenom. Gibberish,
    * wrong-charset, and off-distribution documents surface as high
    * rare_rate exactly as they surface as high perplexity under a float
    * n-gram LM, but every aggregate here is an integer count, so the
    * score is reproducible bit-for-bit across engines (a float log-prob
    * sum is summation-order-dependent and can never hash-match an
    * independent oracle).
    *
    * Scale shape: pass 1 builds the trigram model — explode fuses into a
    * map-side partial agg, so the shuffle carries at most one row per
    * distinct trigram per partition (bounded by the char-alphabet cubed,
    * NOT the corpus). The "common" set collected to the driver is
    * structurally <= relDenom entries (each needs corpus frequency
    * > 1/relDenom), so the broadcast stays small at ANY corpus size.
    * Pass 2 scores map-side: one [[graft.functions.SetCountHits]]
    * membership pass over each doc's positional trigram array — no join,
    * no second shuffle.
    * Output: (doc_id, n_tri, n_rare, rare_rate). */
  def trigramRareRate(
      docs: org.apache.spark.sql.DataFrame, relDenom: Long = 2000L)
      : org.apache.spark.sql.DataFrame =
    trigramScoreAgainst(docs, trigramCommonSet(docs, relDenom))

  /** The model-build half of [[trigramRareRate]]: the corpus's common
    * trigrams (relative frequency > 1/relDenom), structurally ≤ relDenom
    * entries at any corpus size — the frozen "corpus profile" piece that
    * on-ingest scoring ([[trigramScoreAgainst]]) broadcasts. */
  def trigramCommonSet(
      docs: org.apache.spark.sql.DataFrame, relDenom: Long = 2000L): Seq[String] = {
    val spark = docs.sparkSession
    val tris = Dedup.spread(docs)
      .select(col("doc_id"),
        graft.functions.PlanBarrier(spark, graft.functions.TextKernels
          .charNgramArray(spark, col("text"), 3)).as("tris"))
      .where(size(col("tris")) > 0)
    val total = tris
      .agg(sum(size(col("tris")).cast("long"))).collect()(0).getLong(0)
    tris
      .select(explode(col("tris")).as("tri"))
      .groupBy("tri").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * relDenom > total)
      .collect().map(_.getString(0)).toIndexedSeq
  }

  /** The scoring half of [[trigramRareRate]]: rare-trigram-position rate
    * against a STATIC common set — one membership-kernel pass per row,
    * no shuffle, so it runs identically on batch and streaming frames. */
  def trigramScoreAgainst(
      docs: org.apache.spark.sql.DataFrame, common: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    Dedup.spread(docs)
      .select(col("doc_id"),
        graft.functions.PlanBarrier(spark, graft.functions.TextKernels
          .charNgramArray(spark, col("text"), 3)).as("tris"))
      .where(size(col("tris")) > 0)
      .select(
        col("doc_id"),
        size(col("tris")).cast("long").as("n_tri"),
        (size(col("tris")) -
          graft.functions.BloomMembership
            .countSetHits(spark, col("tris"), common))
          .cast("long").as("n_rare"))
      .select(
        col("doc_id"), col("n_tri"), col("n_rare"),
        (col("n_rare").cast("double") / col("n_tri")).as("rare_rate"))
  }

  /** BPE-style merge-loop tokenizer training at word granularity (the
    * Sennrich et al. 2016 greedy loop — the canonical "fit a tokenizer
    * to the corpus" shape, run on word symbols so merges learn multi-word
    * phrases): `k` iterations of {count adjacent symbol pairs across the
    * corpus; take the globally most frequent (ties by pair string);
    * rewrite every occurrence into the merged symbol}. Symbol streams
    * are '|'-delimited strings ('|' and the merge joiner '_' are outside
    * the token alphabet, so symbol boundaries are unambiguous), and the
    * merge rewrite is a leftmost non-overlapping string replace applied
    * TWICE — the second pass catches occurrences whose leading delimiter
    * the first pass consumed (`'|a|b|a|b|'` → one pass merges the 1st
    * and 3rd occurrence kinds only); merged symbols contain '_' so a
    * rewrite never CREATES a new occurrence, making two passes a
    * fixpoint. Both engines implement replace with identical leftmost
    * semantics, so the oracle replays the loop string-for-string.
    *
    * Scale shape: each iteration is one pair-count aggregation (the
    * shuffle BPE training inherently costs — production trainers run it
    * on a corpus sample; pass a sampled frame for that) + a ONE-row
    * driver collect (the argmax pair — same bounded-collect pattern as
    * Lloyd's centroids). The map-side rewrite of the persisted symbol
    * stream is NOT materialized by its own count() job: the NEXT
    * iteration's pair-count aggregation reads through the freshly
    * persisted generation and caches it as a side effect, so each merge
    * costs ONE pass over the stream instead of two (rewrite-count pass +
    * aggregation pass). The previous generation stays cached until that
    * aggregation has run (deferred one-generation unpersist), so
    * iteration i still never recomputes rewrites 1..i-1.
    * Output: (doc_id, n_before, n_after, merged_fp) — one row per doc;
    * merged_fp pins every rewrite byte-for-byte. */
  def bpeMergeLoop(
      docs: org.apache.spark.sql.DataFrame, k: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var st = Dedup.spread(docs).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_before"),
      concat(lit("|"), array_join(tokens(col("text")), "|"), lit("|"))
        .as("st"))
      .persist(lvl)
    // previous symbol-stream generation, kept cached until the current
    // one has been materialized by the next aggregation (see scaladoc)
    var prevGen: org.apache.spark.sql.DataFrame = null
    var i = 0
    var exhausted = false
    while (i < k && !exhausted) {
      val syms = st.select(
        filter(split(col("st"), "\\|"), x => x =!= "").as("sym"))
      val top = syms
        .where(size(col("sym")) >= 2)
        .select(explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => concat(a, lit("|"), b))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      // the aggregation above materialized st's cache; the generation it
      // was rewritten from is now droppable
      if (prevGen != null) { prevGen.unpersist(); prevGen = null }
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val pat = lit("|" + pair + "|")
        val rep = lit("|" + pair.replace('|', '_') + "|")
        prevGen = st
        st = st.withColumn("st",
          replace(replace(col("st"), pat, rep), pat, rep)).persist(lvl)
      }
      i += 1
    }
    val out = st.select(
      col("doc_id"), col("n_before"),
      size(filter(split(col("st"), "\\|"), x => x =!= ""))
        .cast("long").as("n_after"),
      md5(col("st")).as("merged_fp"))
    // safe to drop the loop caches here: the argmax pairs are baked into
    // the plan as literals, so recomputing `out` downstream is ONE
    // map-side scan of docs through k chained replaces — no shuffle, no
    // repeat of the per-iteration pair-count aggregations
    st.unpersist()
    if (prevGen != null) prevGen.unpersist()
    out
  }

  /** SUBWORD BPE merge-loop training (Sennrich et al. 2016 at its native
    * character granularity — [[bpeMergeLoop]] runs the same loop on word
    * symbols and learns phrases; this one learns the tokenizer's subword
    * units): the corpus collapses to its (word, freq) vocabulary, every
    * word becomes a '|'-delimited character stream closed by the '</w>'
    * end-of-word marker, and each of `k` iterations {counts adjacent
    * symbol pairs WEIGHTED BY WORD FREQUENCY; merges the globally most
    * frequent pair (ties by pair string); rewrites every occurrence}.
    * The rewrite is the identical leftmost double-pass string replace as
    * the word-level loop ('|'/'_'/'<'/'/'/'>' are all outside the
    * [a-z0-9] token alphabet, so symbol boundaries stay unambiguous and
    * a rewrite never creates a new occurrence).
    *
    * Scale shape: the corpus-sized work is the ONE tokenize+count
    * aggregation building the vocabulary; every iteration after that
    * runs on |vocab| rows (sublinear in corpus, Heaps' law) — one
    * freq-weighted pair aggregation + a one-row argmax collect. As in
    * [[bpeMergeLoop]], the rewrite is materialized by the NEXT
    * iteration's aggregation, not by a count() job of its own (deferred
    * one-generation unpersist): one pass per merge instead of two. The
    * final frame is unpersisted before returning: downstream recompute
    * replays the vocab aggregation plus k literal-pattern replaces,
    * never the pair-count aggregations.
    *
    * Returns (per-word frame (word, freq, n_syms, st), merge list in
    * order, e.g. "e|s" meaning symbols 'e','s' merged to 'e_s'). */
  def bpeSubwordTrain(
      words: org.apache.spark.sql.DataFrame, k: Int)
      : (org.apache.spark.sql.DataFrame, Seq[String]) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var st = words.select(
      col("word"), col("freq"),
      concat(lit("|"),
        regexp_replace(col("word"), "(.)", "$1|"),
        lit("</w>|")).as("st"))
      .persist(lvl)
    var prevGen: org.apache.spark.sql.DataFrame = null
    val merges = Seq.newBuilder[String]
    var i = 0
    var exhausted = false
    while (i < k && !exhausted) {
      val syms = st.select(
        col("freq"),
        filter(split(col("st"), "\\|"), x => x =!= "").as("sym"))
      val top = syms
        .where(size(col("sym")) >= 2)
        .select(col("freq"), explode(zip_with(
          slice(col("sym"), lit(1), size(col("sym")) - 1),
          slice(col("sym"), lit(2), size(col("sym")) - 1),
          (a, b) => concat(a, lit("|"), b))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .collect()
      // st's cache is materialized now; the generation it was rewritten
      // from is droppable (deferred unpersist — see bpeMergeLoop)
      if (prevGen != null) { prevGen.unpersist(); prevGen = null }
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        merges += pair
        val pat = lit("|" + pair + "|")
        val rep = lit("|" + pair.replace('|', '_') + "|")
        prevGen = st
        st = st.withColumn("st",
          replace(replace(col("st"), pat, rep), pat, rep)).persist(lvl)
      }
      i += 1
    }
    val out = st.select(
      col("word"), col("freq"),
      size(filter(split(col("st"), "\\|"), x => x =!= ""))
        .cast("long").as("n_syms"),
      col("st"))
    st.unpersist()
    if (prevGen != null) prevGen.unpersist()
    (out, merges.result())
  }

  /** [[bpeSubwordTrain]] over a document corpus: vocabulary from the
    * standard tokenizer, one row per distinct word with its learned
    * segmentation after k merges. */
  def bpeSubwordLoop(
      docs: org.apache.spark.sql.DataFrame, k: Int = 6)
      : org.apache.spark.sql.DataFrame = {
    val words = Dedup.spread(docs)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    bpeSubwordTrain(words, k)._1
  }

  /** APPLY the merges learned by [[bpeSubwordTrain]] to tokenize every
    * document — the encode half of BPE. Training and encoding share one
    * symbol-stream representation, so encoding is the same k ordered
    * merge rewrites replayed on each document's stream.
    *
    * No join is needed: a document's stream is the concatenation of its
    * tokens' word streams (`|c|h|a|r|s|</w>|` each), which puts `||`
    * between adjacent words — and since a merge pattern `|x|y|` needs
    * its symbols separated by a SINGLE delimiter, no rewrite can span a
    * word boundary. Applying the k merges to the whole-document stream
    * therefore segments every word exactly as its trained vocabulary row
    * (`BpeEncodeSpec` pins this equivalence), without shipping the
    * vocabulary anywhere.
    *
    * Scale shape: the corpus-sized work is the vocabulary aggregation the
    * training loop already does plus ONE map-side projection pass over
    * the corpus — k literal-pattern replaces inside the scan's codegen
    * span, zero additional shuffles, no driver state beyond the k merge
    * strings (the Lloyd's-centroid bounded-collect pattern). At 100 TB
    * encoding is scan-bound, exactly like the hashed classifier.
    *
    * Output: (doc_id, n_tokens, n_subtokens, enc_fp) — enc_fp is md5 of
    * the encoded stream, pinning every merge byte-for-byte. */
  def bpeEncode(
      docs: org.apache.spark.sql.DataFrame, k: Int = 6)
      : org.apache.spark.sql.DataFrame = {
    val d = Dedup.spread(docs)
    val words = d
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val merges = bpeSubwordTrain(words, k)._2
    val toks = tokens(col("text"))
    val st0 = concat_ws("", transform(toks,
      t => concat(lit("|"), regexp_replace(t, "(.)", "$1|"), lit("</w>|"))))
    val stEnc = merges.foldLeft(st0) { (c, m) =>
      val pat = lit("|" + m + "|")
      val rep = lit("|" + m.replace('|', '_') + "|")
      replace(replace(c, pat, rep), pat, rep)
    }
    d
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        stEnc.as("st"))
      .select(col("doc_id"), col("n_tokens"),
        size(filter(split(col("st"), "\\|"), x => x =!= ""))
          .cast("long").as("n_subtokens"),
        md5(col("st")).as("enc_fp"))
  }

  /** fastText-style linear quality classifier scoring via the hashing
    * trick (Joulin et al. 2017; the quality-filter shape used for
    * GPT-3/LLaMA-class corpus curation): features are the document's
    * unigrams plus adjacent-word bigrams, each feature is HASHED to its
    * weight — no vocabulary lookup, no weight-table join — and the
    * document's score is the feature-weight sum in integer micro-units
    * (engine-exact; a float dot product could never hash-match an
    * independent oracle).
    *
    * The weight function here derives each bucket's weight from md5 of
    * the feature itself (uniform in [-1000, 1000] micro-units, seeded) —
    * a deterministic, self-contained stand-in for a trained model's
    * bucket array that keeps the whole operator oracle-replayable. A
    * production model swaps ONE inner lambda: weight = trainedBuckets
    * (hash(f) % nBuckets), with the bucket array shipped by broadcast —
    * the scoring plan (and its scale shape) is unchanged (see
    * [[trainClassifier]] for the trained form).
    *
    * Scale shape: ZERO shuffles — tokenize, feature-expand, hash, and
    * sum all happen in ONE kernel call per row inside the scan's codegen
    * span ([[graft.functions.ClassifierScoreExpr]]; a builtin-HOF
    * formulation was measured and replaced: transform/aggregate lambdas
    * are CodegenFallback, and the collapsed projection re-ran the
    * tokenizer per reference), in deliberate contrast to
    * [[graft.ext.MixOps.dsirSelect]]'s learned per-token weights, which
    * cost a token aggregation + join. At 100 TB a hashed classifier
    * scores every document in exactly one pass of the scan.
    * Output: (doc_id, n_features, score_micros, keep). */
  def hashClassifier(
      docs: org.apache.spark.sql.DataFrame, seed: String = "s1")
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    docs
      .select(col("doc_id"),
        graft.functions.TextKernels
          .classifierScoreCol(spark, col("text"), seed).as("cs"))
      .select(
        col("doc_id"),
        col("cs.n_features").as("n_features"),
        col("cs.score_micros").as("score_micros"),
        (col("cs.score_micros") > 0).as("keep"))
  }

  /** The deterministic keep/drop label the trained classifier fits:
    * "stopword-bearing English-like prose" — at least 1 in 20 tokens is
    * an English stopword. A pure per-row predicate both engines replay
    * exactly (integer comparison, no float threshold). */
  def classifierLabel(text: Column): Column =
    matchCount(text, LangStopwords.head._2) * 20 >= size(
      regexp_extract_all(lower(text), lit(TokenPattern), lit(0)))

  /** Fit bucket-array weights for the hashed classifier on labeled
    * documents: event-level naive-Bayes log-odds per feature bucket
    * (add-one smoothed), in integer micro-units — the same
    * log-ratio-rounded-to-micro recipe as [[MixOps.dsirSelect]], so an
    * independent SQL engine replays every weight bit-for-bit.
    *
    * Scale shape: feature expansion is the shingle kernel (unigrams +
    * bigrams, one call per row, map-side); the only shuffle is the
    * bucket-count aggregation whose output is <= nBuckets rows — the
    * bounded driver collect (nBuckets * 24 B) that Lloyd's centroids and
    * the BPE argmax also use. Weights for buckets unseen in training get
    * the smoothed empty-bucket log-odds, computed with the same Spark
    * `log`/`round` expressions so rounding matches the per-bucket path.
    * Returns the nBuckets-length micro-unit weight array. */
  def trainClassifier(
      docs: org.apache.spark.sql.DataFrame, labelCol: Column,
      nBuckets: Int = 65536): Array[Long] = {
    val spark = docs.sparkSession
    graft.functions.TextKernels.register(spark)
    val feats = Dedup.spread(docs)
      .select(labelCol.as("pos"),
        concat(
          call_function("graft_shingles", col("text"), lit(1)),
          call_function("graft_shingles", col("text"), lit(2))).as("fs"))
      .select(col("pos"), explode(col("fs")).as("f"))
      .select(col("pos"),
        (conv(substr(md5(col("f")), lit(1), lit(8)), 16, 10)
          .cast("long") % nBuckets).as("b"))
    // <= nBuckets rows; persisted because BOTH the totals action and the
    // weight collect below would otherwise replay the feature explode +
    // aggregation over the whole training text (measured: one full fit
    // pass each at sf0.1)
    val cnt = feats.groupBy("b").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("cneg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = cnt.agg(
      sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg")).first()
    val (npos, nneg) = (tot.getLong(0), tot.getLong(1))
    def logOdds(cpos: Column, cneg: Column): Column =
      round(
        (log((cpos + lit(1.0)) / lit(npos + nBuckets.toDouble)) -
          log((cneg + lit(1.0)) / lit(nneg + nBuckets.toDouble))) * 1e6, 0)
        .cast("long")
    // empty-bucket default through the SAME engine expressions, so its
    // rounding matches what an oracle computes for an unseen bucket
    val w0 = spark.range(1)
      .select(logOdds(lit(0L), lit(0L)).as("w")).first().getLong(0)
    val w = Array.fill(nBuckets)(w0)
    cnt.select(col("b"), logOdds(col("cpos"), col("cneg")).as("w"))
      .collect()
      .foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    cnt.unpersist()
    w
  }

  /** Trained-classifier scoring of the whole corpus: fit on the even
    * doc_ids (a deterministic 50% split), score every document with the
    * learned bucket array, and CALIBRATE the keep threshold on the train
    * half. The raw naive-Bayes score carries a per-feature smoothing bias
    * that scales with document length (measured: threshold-0 keep
    * collapses to the majority class), so the decision statistic is the
    * PER-FEATURE score `vm = round(score_micros * 1000 / n_features)` —
    * integer milli-units, identical IEEE ops in any engine — and the
    * threshold is the k-th largest train vm where k = positive train
    * docs, so the train keep-rate matches the label rate (the standard
    * quantile calibration, and the same trick q_rank_calibrate uses).
    * The k-th value comes from [[MixOps.globalRank]] — a distributed
    * prefix-sum rank, never a driver sort — so calibration stays one
    * bounded (1-row) collect at any corpus size.
    *
    * Scoring is EXACTLY [[hashClassifier]]'s plan — one kernel call per
    * row, zero shuffles — plus one broadcast-threshold comparison.
    * Output: (doc_id, n_features, score_micros, keep = vm > thr). */
  def trainedClassifier(
      docs: org.apache.spark.sql.DataFrame, nBuckets: Int = 65536)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val label = classifierLabel(col("text"))
    val train = docs.where(col("doc_id") % 2 === 0)
    val w = trainClassifier(train, label, nBuckets)
    def scored(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        graft.functions.TextKernels
          .classifierTrainedCol(spark, col("text"), w).as("cs"))
      .select(
        col("doc_id"),
        col("cs.n_features").as("n_features"),
        col("cs.score_micros").as("score_micros"))
      .withColumn("vm",
        when(col("n_features") > 0,
          round(col("score_micros") * lit(1000.0) / col("n_features"), 0)
            .cast("long"))
          .otherwise(lit(0L)))
    val k = train.where(label).count()
    // globalRank persists its (doc_id, score) projection internally, so
    // the scoring kernel runs once over the training text, not once per
    // decomposition pass; the threshold collect is this caller's LAST
    // action on the rank frame, so release the projection right after
    val thr =
      if (k == 0L) Long.MaxValue
      else {
        val ranked = MixOps.globalRankReleasable(
          scored(train).select(col("doc_id"), col("vm").as("score")))
        try ranked.df
          .where(col("rnk") === k)
          .select(col("score")).first().getLong(0)
        finally ranked.release()
      }
    scored(docs).select(
      col("doc_id"), col("n_features"), col("score_micros"),
      (col("vm") > thr).as("keep"))
  }
}
