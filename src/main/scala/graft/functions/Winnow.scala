package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (the MOSS scheme, Schleimer/Wilkerson/
  * Aiken SIGMOD'03): hash every character k-gram of the whitespace-free
  * normalized text, then from each window of w consecutive gram hashes
  * keep the minimum — any two documents sharing a run of >= k+w-1
  * normalized characters are GUARANTEED to share a fingerprint, and the
  * selected set is a ~2/(w+1) fraction of all grams. The fingerprint join
  * is therefore both the dedup signal and its own candidate pruner:
  * documents with no shared fingerprint never meet.
  *
  * Two hash modes, one selection algorithm:
  *  - md5 (portable): gram hash = first 8 hex chars of md5(gram) as a
  *    long — reproducible in any engine with md5, which buys the DuckDB
  *    oracle for [[graft.ext.Dedup.winnowNearDup]].
  *  - rolling (scale): true Karp-Rabin — the polynomial hash of gram i+1
  *    derives from gram i in O(1), finalized through murmur's fmix64 so
  *    window-min selection sees well-mixed values. O(len) per document
  *    vs md5's O(len * k) digesting; the hash VALUES are engine-specific,
  *    so the rolling variant ships behind a recall gate
  *    (q_winnow_fast), like the xxhash SimHash.
  *
  * One codegen call per document (tokenize, normalize, gram-hash, and the
  * monotone-deque window minimum all inside the scan's codegen span);
  * output is the distinct fingerprint array, empty when the normalized
  * text has fewer than k+w-1 characters — short documents drop out, same
  * as the oracle's WHERE guards. */
case class WinnowExpr(
    first: Expression, second: Expression, third: Expression, rolling: Boolean)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (rolling) "graft_winnow_rolling" else "graft_winnow"

  override def nullSafeEval(text: Any, k: Any, w: Any): Any =
    Winnow.fingerprints(
      text.asInstanceOf[UTF8String], k.asInstanceOf[Int], w.asInstanceOf[Int], rolling)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k, w) =>
      s"graft.functions.Winnow.fingerprints($t, $k, $w, $rolling)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Winnow {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val TokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** murmur3 fmix64: bijective avalanche of the raw rolling polynomial so
    * window minima are taken over well-mixed values. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Distinct winnowed fingerprints of `text` (see [[WinnowExpr]]). */
  def fingerprints(text: UTF8String, k: Int, w: Int, rolling: Boolean): ArrayData = {
    // normalize: lowercase [a-z0-9]+ tokens, concatenated without spaces
    val m = TokenPattern.matcher(text.toLowerCase.toString)
    val sb = new java.lang.StringBuilder
    while (m.find()) sb.append(m.group())
    val s = sb.toString
    val nGrams = s.length - k + 1
    val nWins = nGrams - w + 1
    if (nWins <= 0) return ArrayData.toArrayData(Array.empty[Long])

    val hashes = new Array[Long](nGrams)
    if (rolling) {
      // Karp-Rabin: h_{i+1} = (h_i - s(i) * B^(k-1)) * B + s(i+k), with
      // 64-bit wraparound arithmetic, finalized through fmix64; >>> 1
      // keeps values non-negative for stable ordering everywhere.
      val B = 1000003L
      var bk = 1L
      var j = 1
      while (j < k) { bk *= B; j += 1 }
      var h = 0L
      var i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      hashes(0) = fmix64(h) >>> 1
      i = 1
      while (i < nGrams) {
        h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
        hashes(i) = fmix64(h) >>> 1
        i += 1
      }
    } else {
      // portable: first 4 md5 bytes big-endian, as in the oracle's
      // ('0x' || substr(md5(gram), 1, 8))::BIGINT
      val digest = md.get()
      var i = 0
      while (i < nGrams) {
        digest.reset()
        val b = digest.digest(s.substring(i, i + k).getBytes("UTF-8"))
        hashes(i) = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
          ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
        i += 1
      }
    }

    // window minimum via monotone deque (O(nGrams)); distinct via set
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque indices in [head, tail)
    var i = 0
    while (i < nGrams) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hashes(deque(head)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var n = 0
    while (it.hasNext) { arr(n) = it.next(); n += 1 }
    ArrayData.toArrayData(arr)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow",
      exprs => WinnowExpr(exprs(0), exprs(1), exprs(2), rolling = false), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow_rolling",
      exprs => WinnowExpr(exprs(0), exprs(1), exprs(2), rolling = true), "built-in")
  }

  /** Column API: distinct winnowed fingerprint array of `text`. */
  def apply(spark: SparkSession, text: Column, k: Int, w: Int,
            rolling: Boolean = false): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      if (rolling) "graft_winnow_rolling" else "graft_winnow",
      text, org.apache.spark.sql.functions.lit(k), org.apache.spark.sql.functions.lit(w))
  }
}
