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
}
