package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object TextKernels {

  private val TokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

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
