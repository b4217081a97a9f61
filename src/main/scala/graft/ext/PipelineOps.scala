package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** Boilerplate detection: shingles occurring in >= `minDf` distinct
    * documents are boilerplate (navigation chrome, license headers, shared
    * templates); a document whose distinct-shingle set is more than
    * `maxRatio` boilerplate is dropped. One shuffle on the shingle (df
    * count), one on doc_id (per-doc ratio) — the df side aggregates to the
    * distinct-shingle table, never rejoining raw text.
    * Output: (doc_id, n_sh, boiler_sh, boiler_ratio, keep). */
  def boilerplate(
      docs: DataFrame, minDf: Long = 3, maxRatio: Double = 0.3): DataFrame = {
    val sh = Dedup.docShingles(docs)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("shingle"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_sh"),
        count(when(col("df") >= minDf, 1)).as("boiler_sh"))
      .select(
        col("doc_id"), col("n_sh"), col("boiler_sh"),
        (col("boiler_sh").cast("double") / col("n_sh")).as("boiler_ratio"),
        (col("boiler_sh").cast("double") / col("n_sh") <= maxRatio).as("keep"))
  }

  /** Email + NANP-style phone regexes, in Spark and DuckDB spellings (the
    * dialects agree on this subset; DuckDB just needs the 'g' flag to
    * replace globally, which Spark does by default). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"

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
