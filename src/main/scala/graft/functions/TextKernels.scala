package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of lowercased `[a-z0-9]+` tokens as ONE codegen'd
  * expression call per document (`graft_shingles` / `graft_shingles_distinct`).
  *
  * Replaces the previous shingle pipeline — posexplode all tokens, SHUFFLE
  * by doc_id, per-doc sort, `lead()` window — whose exchange+sort of the
  * exploded token table dominated every dedup query (Jaccard, MinHash-LSH,
  * SimHash, cluster resolution). Tokenization and the sliding n-gram window
  * are embarrassingly per-row, so the kernel does both inside the scan's
  * whole-stage-codegen span: zero exchanges, and the only shuffled rows
  * downstream are the (much smaller) per-doc aggregates. Output values are
  * byte-identical to `lower()` + `regexp_extract_all` + window-lead (same
  * UTF8String.toLowerCase, same java.util.regex pattern), so every DuckDB
  * oracle over shingles is unchanged.
  *
  * The `distinct` variant set-dedups IN the kernel (insertion order), which
  * removes the `.distinct()` exchange the set-based consumers (Jaccard
  * sizes, SimHash votes) previously paid on corpus-sized shingle rows.
  */
case class ShinglesExpr(left: Expression, right: Expression, distinct: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String =
    if (distinct) "graft_shingles_distinct" else "graft_shingles"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.shingles(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextKernels.shingles($t, $n, $distinct)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Non-overlapping k-token chunks of the document's token stream — the
  * "paragraph" unit for chunk-level corpus dedup (this corpus has no line
  * structure, so fixed-width token windows stand in for paragraphs). The
  * trailing partial chunk IS included: dropping it would exempt the tail of
  * every document from dedup. Same zero-exchange codegen shape as
  * [[ShinglesExpr]]. */
case class ChunksExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_chunks"

  override def nullSafeEval(text: Any, k: Any): Any =
    TextKernels.chunks(text.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.TextKernels.chunks($t, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All overlapping character n-grams of the lowercased document, one per
  * code-point position — the unit of the corpus trigram language model
  * ([[graft.ext.TextOps.trigramRareRate]]). Positional (non-distinct):
  * the LM scores POSITIONS, so a gram occurring five times in a doc must
  * count five times. Code-point semantics match DuckDB's
  * `substring(lower(text), i, n)`, which the oracle uses. Same
  * zero-exchange codegen shape as [[ShinglesExpr]]. */
case class CharNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(text: Any, n: Any): Any =
    TextKernels.charNgrams(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.TextKernels.charNgrams($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-document repetition signals (the Gopher/MassiveText repetition
  * filters) in ONE pass over the token stream — no explode, no shuffle:
  * the statistics are embarrassingly per-row, so the kernel computes the
  * 2-gram and 3-gram frequency maps in thread-local hash tables inside
  * the scan's codegen span, and only the five-field result struct leaves
  * the row. Tie-break for the top 2-gram is (count DESC, gram ASC) —
  * byte order, which for the `[a-z0-9 ]` gram alphabet equals both
  * DuckDB's binary collation and Java's String order, making the result
  * oracle-hashable. Returns null for documents with < 3 tokens (no
  * 3-gram exists; callers filter).
  *
  * Fields: n_tokens, alpha_chars (sum of token lengths = chars the
  * fraction denominators use), top2_gram, top2_cnt, dup3_chars (chars
  * covered by every occurrence of 3-grams seen more than once). */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("alpha_chars", LongType, nullable = false),
    StructField("top2_gram", StringType, nullable = false),
    StructField("top2_cnt", LongType, nullable = false),
    StructField("dup3_chars", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition_stats"

  override def nullSafeEval(text: Any): Any =
    TextKernels.repetitionStats(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
      ${ev.value} = graft.functions.TextKernels.repetitionStats($t);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** fastText-style hashed linear classifier scoring in ONE pass over the
  * document (Joulin et al. 2017 hashing trick): unigram + adjacent-bigram
  * features, each hashed straight to its weight — md5-derived micro-units
  * in [-1000, 1000], byte-identical to the oracle's
  * `('0x' || substr(md5(seed || ':' || f), 1, 8))::BIGINT % 2001 - 1000`
  * — summed into an integer score. Tokenize, feature-expand, hash, and
  * accumulate all happen inside the scan's span; only the two-field
  * result struct leaves the row. A trained production model replaces
  * [[TextKernels.classifierWeight]] with a bucket-array lookup
  * (hash(f) % nBuckets) — the plan shape is unchanged.
  *
  * Fields: n_features, score_micros. */
case class ClassifierScoreExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("score_micros", LongType, nullable = false)))
  override def prettyName: String = "graft_classifier_score"

  override def nullSafeEval(text: Any, seed: Any): Any =
    TextKernels.classifierScore(
      text.asInstanceOf[UTF8String], seed.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) =>
      s"graft.functions.TextKernels.classifierScore($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** [[ClassifierScoreExpr]] with a TRAINED bucket array instead of
  * md5-derived pseudo-weights: each unigram/bigram feature hashes to
  * `u32(md5(f)) % nBuckets` and its bucket's learned micro-unit weight is
  * summed. The weight array ships as a BINARY literal (little-endian
  * longs, unpacked once per task — the [[MatVecLit]] lesson: a boxed
  * array literal poisons plan copies/canonicalization), so the scoring
  * plan is byte-for-byte the strawman's: one kernel call per row inside
  * the scan's codegen span, zero shuffles, nBuckets*8 bytes broadcast
  * with the plan.
  *
  * Fields: n_features, score_micros. */
case class TrainedClassifierExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_features", LongType, nullable = false),
    StructField("score_micros", LongType, nullable = false)))
  override def prettyName: String = "graft_classifier_trained"

  @transient private lazy val wArr: Array[Long] =
    TextKernels.unpackWeights(right.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(text: Any, wts: Any): Any =
    TextKernels.trainedClassifierScore(text.asInstanceOf[UTF8String], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) => {
      val w = ctx.addReferenceObj("wArr", wArr, "long[]")
      s"${ev.value} = graft.functions.TextKernels.trainedClassifierScore($t, $w);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Content-defined-chunking cut positions in ONE kernel pass
  * (`graft_cdc_cuts`): 1-based positions i of `lower(text)` where the
  * w-char window starting at i satisfies `u32(md5(window)) % mask == 0`
  * — byte-identical to the oracle's per-position
  * `('0x' || substr(md5(substr(t, i, w)), 1, 8))::BIGINT % mask = 0`,
  * but with one reused MessageDigest and no hex round-trip (the SQL
  * formulation pays a UTF8String/hex-string allocation per position;
  * measured 3x+ on the corpus scan). */
case class CdcCutsExpr(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(text: Any, w: Any, mask: Any): Any =
    TextKernels.cdcCuts(
      text.asInstanceOf[UTF8String], w.asInstanceOf[Int],
      mask.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w, m) =>
      s"graft.functions.TextKernels.cdcCuts($t, $w, $m)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TextKernels {

  private val TokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** See [[CdcCutsExpr]]. Positions and window extents are CODE POINTS
    * (like [[charNgrams]]) — the consumers slice with Spark `substr` and
    * the oracle with DuckDB `substr`, both code-point-addressed, so a
    * UTF-16 walk would mis-slice every chunk after a supplementary
    * character (and could split a surrogate pair before hashing). The
    * window slides with two UTF-16 pointers, O(len) total. */
  def cdcCuts(text: UTF8String, w: Int, mask: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val cps = s.codePointCount(0, s.length)
    if (cps < w) return ArrayData.toArrayData(Array.empty[Int])
    val digest = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Integer]()
    var i16 = 0 // UTF-16 offset of the window's first code point
    var j16 = 0 // UTF-16 offset one past the window's last code point
    var c = 0
    while (c < w) { j16 += Character.charCount(s.codePointAt(j16)); c += 1 }
    var pos = 1 // 1-based code-point position of the window start
    var done = false
    while (!done) {
      digest.reset()
      val b = digest.digest(s.substring(i16, j16).getBytes("UTF-8"))
      val u = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
      if (u % mask == 0L) out.add(pos)
      if (j16 >= s.length) done = true
      else {
        j16 += Character.charCount(s.codePointAt(j16))
        i16 += Character.charCount(s.codePointAt(i16))
        pos += 1
      }
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    ArrayData.toArrayData(arr)
  }

  /** Weight of one hashed feature: first 4 md5 bytes of "seed:feature"
    * as an unsigned 32-bit int, mod 2001, minus 1000 — exactly the
    * oracle's hex arithmetic ([[ClassifierScoreExpr]]). */
  def classifierWeight(
      md: java.security.MessageDigest, seed: String, f: String): Long = {
    val d = md.digest((seed + ":" + f).getBytes("UTF-8"))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    u % 2001L - 1000L
  }

  /** Bucket of one hashed feature: first 4 md5 bytes of the feature as
    * an unsigned 32-bit int, mod nBuckets — the oracle's
    * `('0x' || substr(md5(f), 1, 8))::BIGINT % B`. */
  def featureBucket(
      md: java.security.MessageDigest, f: String, nBuckets: Int): Int = {
    val d = md.digest(f.getBytes("UTF-8"))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % nBuckets).toInt
  }

  /** See [[TrainedClassifierExpr]]: unigram + adjacent-bigram features,
    * each summing its learned bucket weight. */
  def trainedClassifierScore(text: UTF8String, w: Array[Long]): InternalRow = {
    val s = text.toLowerCase.toString
    val m = TokenPattern.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(m.group())
    val n = toks.size
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = w.length
    var score = 0L
    var i = 0
    while (i < n) {
      score += w(featureBucket(md, toks.get(i), b))
      if (i < n - 1)
        score += w(featureBucket(md, toks.get(i) + " " + toks.get(i + 1), b))
      i += 1
    }
    val nFeatures = if (n == 0) 0L else (2L * n) - 1L
    new GenericInternalRow(Array[Any](nFeatures, score))
  }

  def packWeights(w: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(w.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    w.foreach(bb.putLong)
    bb.array()
  }

  def unpackWeights(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(i * 8); i += 1 }
    out
  }

  /** See [[ClassifierScoreExpr]]. */
  def classifierScore(text: UTF8String, seed: UTF8String): InternalRow = {
    val s = text.toLowerCase.toString
    val m = TokenPattern.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(m.group())
    val n = toks.size
    val seedStr = seed.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    var score = 0L
    var i = 0
    while (i < n) {
      score += classifierWeight(md, seedStr, toks.get(i))
      if (i < n - 1)
        score += classifierWeight(
          md, seedStr, toks.get(i) + " " + toks.get(i + 1))
      i += 1
    }
    val nFeatures = if (n == 0) 0L else (2L * n) - 1L
    new GenericInternalRow(Array[Any](nFeatures, score))
  }

  /** See [[RepetitionStatsExpr]]. Null when the document has < 3 tokens. */
  def repetitionStats(text: UTF8String): InternalRow = {
    val s = text.toLowerCase.toString
    val m = TokenPattern.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(m.group())
    val n = toks.size
    if (n < 3) return null
    var alphaChars = 0L
    var i = 0
    while (i < n) { alphaChars += toks.get(i).length; i += 1 }
    // top word-2-gram by (count DESC, gram ASC)
    val g2 = new java.util.HashMap[String, Long](n * 2)
    i = 0
    while (i < n - 1) {
      val g = toks.get(i) + " " + toks.get(i + 1)
      g2.merge(g, 1L, java.lang.Long.sum(_, _))
      i += 1
    }
    var topGram: String = null
    var topCnt = 0L
    val it2 = g2.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val better = e.getValue > topCnt ||
        (e.getValue == topCnt && (topGram == null || e.getKey.compareTo(topGram) < 0))
      if (better) { topGram = e.getKey; topCnt = e.getValue }
    }
    // chars covered by every occurrence of word-3-grams with count > 1
    val g3 = new java.util.HashMap[String, Long](n * 2)
    i = 0
    while (i < n - 2) {
      val g = toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2)
      g3.merge(g, 1L, java.lang.Long.sum(_, _))
      i += 1
    }
    var dup3 = 0L
    val it3 = g3.entrySet().iterator()
    while (it3.hasNext) {
      val e = it3.next()
      if (e.getValue > 1) dup3 += e.getValue * (e.getKey.length - 2L)
    }
    new GenericInternalRow(Array[Any](
      n.toLong, alphaChars, UTF8String.fromString(topGram), topCnt, dup3))
  }

  /** All overlapping char n-grams of lowercase `text`, by code point
    * (empty array when the text has fewer than n code points). */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val cps = s.codePointCount(0, s.length)
    val cnt = cps - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt)
    var i = 0          // char (UTF-16 unit) offset of the window start
    var k = 0          // gram index (code-point position)
    while (k < cnt) {
      // advance a second pointer n code points past the window start
      var j = i
      var c = 0
      while (c < n) { j += Character.charCount(s.codePointAt(j)); c += 1 }
      out(k) = UTF8String.fromString(s.substring(i, j))
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping k-token chunks (trailing partial included; empty array
    * for token-less documents). */
  def chunks(text: UTF8String, k: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val m = TokenPattern.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(m.group())
    val nTok = toks.size
    if (nTok == 0) return new GenericArrayData(Array.empty[Any])
    val nChunks = (nTok + k - 1) / k
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder
    var c = 0
    while (c < nChunks) {
      sb.setLength(0)
      var i = c * k
      val end = math.min(i + k, nTok)
      while (i < end) {
        if (i > c * k) sb.append(' ')
        sb.append(toks.get(i))
        i += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** All complete n-gram shingles of `text`'s token stream, positionally
    * ordered; `distinct` keeps first occurrences only. Empty array when the
    * document has fewer than n tokens. */
  def shingles(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toLowerCase.toString
    val m = TokenPattern.matcher(s)
    val toks = new java.util.ArrayList[String]()
    while (m.find()) toks.add(m.group())
    val cnt = toks.size - (n - 1)
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](cnt)
    val seen: java.util.HashSet[String] =
      if (distinct) new java.util.HashSet[String](cnt * 2) else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(i + k))
        k += 1
      }
      val sh = sb.toString
      if (!distinct || seen.add(sh)) out.add(UTF8String.fromString(sh))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => ShinglesExpr(exprs(0), exprs(1), distinct = false), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles_distinct",
      exprs => ShinglesExpr(exprs(0), exprs(1), distinct = true), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_chunks",
      exprs => ChunksExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_ngrams",
      exprs => CharNgramsExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition_stats",
      exprs => RepetitionStatsExpr(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_classifier_score",
      exprs => ClassifierScoreExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_classifier_trained",
      exprs => TrainedClassifierExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_cuts",
      exprs => CdcCutsExpr(exprs(0), exprs(1), exprs(2)), "built-in")
  }

  /** Column API: 1-based CDC cut positions of `lower(text)` (see
    * [[CdcCutsExpr]]). */
  def cdcCutsCol(
      spark: SparkSession, text: Column, w: Int, mask: Int): Column = {
    // fail at plan time, not per-row at execution: mask <= 0 would throw
    // ArithmeticException inside the kernel's `u % mask`, and w <= 0
    // would produce nonsense window extents
    require(w >= 1, s"cdcCutsCol: window w must be >= 1 (got $w)")
    require(mask >= 1, s"cdcCutsCol: mask must be >= 1 (got $mask)")
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_cdc_cuts", text,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(mask))
  }

  /** Column API: (n_features, score_micros) struct of the hashed linear
    * classifier (see [[ClassifierScoreExpr]]). */
  def classifierScoreCol(
      spark: SparkSession, text: Column, seed: String): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_classifier_score", text,
      org.apache.spark.sql.functions.lit(seed))
  }

  /** Column API: (n_features, score_micros) struct of the TRAINED hashed
    * classifier (see [[TrainedClassifierExpr]]); `weights(b)` is bucket
    * b's micro-unit weight. */
  def classifierTrainedCol(
      spark: SparkSession, text: Column, weights: Array[Long]): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_classifier_trained", text,
      org.apache.spark.sql.functions.lit(packWeights(weights)))
  }

  /** Column API: per-doc repetition-signal struct (see
    * [[RepetitionStatsExpr]]); null for documents with < 3 tokens. */
  def repetitionStatsCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_repetition_stats", text)
  }

  /** Column API: positional char n-gram array of lowercase `text`. */
  def charNgramArray(spark: SparkSession, text: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_char_ngrams", text, org.apache.spark.sql.functions.lit(n))
  }

  /** Column API: non-overlapping k-token chunk array of `text`. */
  def chunkArray(spark: SparkSession, text: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_chunks", text, org.apache.spark.sql.functions.lit(k))
  }

  /** Column API: shingle array of `text` (see [[ShinglesExpr]]). */
  def shingleArray(
      spark: SparkSession, text: Column, n: Int, distinct: Boolean): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      if (distinct) "graft_shingles_distinct" else "graft_shingles",
      text, org.apache.spark.sql.functions.lit(n))
  }
}
