package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.9): exact, normalized-fingerprint,
  * n-gram Jaccard, and MinHash-LSH near-dup.
  *
  * Scale notes (100 TB):
  *  - exact/normalized dedup: one shuffle on the (hashed) key; group-by of
  *    md5 fingerprints instead of full text keeps shuffle rows small.
  *  - Jaccard pair generation shuffles by shingle; frequency-capping hot
  *    shingles (maxShingleDocs) bounds the quadratic blow-up of common
  *    shingles — the standard candidate-pruning used in web-scale dedup.
  *  - MinHash-LSH replaces the all-pairs shingle join with a band-bucket
  *    join: candidate volume is controlled by (bands, rows-per-band), and
  *    signatures are tiny (numHashes strings per doc). The hash family is
  *    md5(shingle || '#' || i) — deterministic and portable, so the DuckDB
  *    oracle reproduces it exactly.
  */
object Dedup {

  /** One row per distinct document shingle: (doc_id, shingle). */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(
      col("doc_id"),
      explode(TextOps.shingles(TextOps.tokens(col("text")), n)).as("shingle"))
      .distinct()

  /** Shingle-set sizes per doc. */
  private def shingleSizes(sh: DataFrame): DataFrame =
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))

  /** Exact Jaccard over candidate pairs: join both docs' shingle sets.
    * `pairs` must have columns (doc_a, doc_b). */
  def jaccardFor(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sz = shingleSizes(sh)
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .join(pairs, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard near-duplicates above `threshold`.
    * Pair generation via shingle self-join (exact); at scale prefer
    * [[minhashNearDup]] which prunes candidates first. */
  def jaccardNearDup(docs: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    val sh = docShingles(docs, n)
    val sz = shingleSizes(sh)
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** MinHash signature components: for hash index i, sig_i(doc) =
    * min over shingles of md5(shingle || '#' || i). Lexicographic min over
    * fixed-width lowercase hex == numeric min over the 128-bit hash. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val withI = sh.select(
      col("doc_id"), col("shingle"),
      explode(sequence(lit(0), lit(numHashes - 1))).as("i"))
    withI
      .groupBy("doc_id", "i")
      .agg(min(md5(concat(col("shingle"), lit("#"), col("i")))).as("sig"))
  }

  /** MinHash-LSH near-dup: band signatures into `bands` buckets of
    * `rowsPerBand`, bucket-join for candidates, then verify with exact
    * Jaccard >= threshold. Fully deterministic (md5 hash family). */
  def minhashNearDup(
      docs: DataFrame,
      threshold: Double,
      bands: Int = 3,
      rowsPerBand: Int = 3,
      n: Int = 3): DataFrame = {
    val sh = docShingles(docs, n)
    val sigs = minhashSignatures(sh, bands * rowsPerBand)
    // band key: md5 of the concatenated sigs of the band (i order is fixed
    // by constructing each band column explicitly — no order-by-in-agg).
    val bandKeys = sigs
      .withColumn("band", (col("i") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws(",", (0 until rowsPerBand).map(r =>
        min(when(col("i") % rowsPerBand === r, col("sig")))): _*)).as("bkey"))
    val l = bandKeys.select(col("doc_id").as("doc_a"), col("band"), col("bkey"))
    val r = bandKeys.select(col("doc_id").as("doc_b"), col("band"), col("bkey"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    jaccardFor(candidates, sh).where(col("jaccard") >= threshold)
  }

  /** SimHash (64-bit) from token sets using xxhash64 — Spark-native scale
    * path (no portable oracle; verified by rows-only check + unit tests).
    * simhash bit b = sign of sum over tokens of (bit_b(xxhash64(token))*2-1).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs.select(
      col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
    val bits = tok
      .select(
        col("doc_id"), xxhash64(col("token")).as("h"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("(shiftright(h, b) & 1) * 2 - 1")).as("v"))
    bits
      .groupBy("doc_id")
      .agg(sum(expr("if(v > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))"))
        .cast("long").as("simhash"))
  }
}
