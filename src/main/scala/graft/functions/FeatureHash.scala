package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic feature-hashed document embedding (the "hashing trick"):
  * each distinct 3-gram shingle of the document contributes +-1 to one of
  * `d` dimensions, with both the dimension and the sign derived from
  * md5(shingle) — dimension = first 8 hex chars as an integer mod d, sign
  * = lowest bit of the 9th hex char. Near-duplicate documents share most
  * shingles, so their vectors land at cosine ~0.9+, while unrelated
  * documents sit near 0 (random signs cancel): a text-derived embedding
  * with REAL near-dup structure, unlike the synthetic-random `embeddings`
  * table whose pair similarities form a featureless continuum.
  *
  * md5-derived placement makes the embedding reproducible in ANY engine
  * with md5 (the DuckDB oracle rebuilds it from `shinglesCte`), and the
  * feature values are small integer counts, so dot products and norms are
  * exact integer arithmetic in doubles — accumulation order cannot change
  * a single bit of the result, which is what lets cosine thresholds
  * hash-match across engines.
  *
  * One codegen call per document inside the scan's whole-stage span: the
  * tokenize -> shingle -> hash -> accumulate pipeline emits a single
  * d-length vector per row with zero exchanges (the 100 TB shape — the
  * corpus is embedded in one map pass). */
case class FeatureHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_feature_hash"

  override def nullSafeEval(text: Any, d: Any): Any =
    FeatureHash.embed(text.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) =>
      s"graft.functions.FeatureHash.embed($t, $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FeatureHash {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** d-dimensional +-1-count embedding over the distinct 3-gram shingle
    * set of `text`. Bit-compatible with the SQL formulation
    * `('0x' || substr(md5(shingle), 1, 8))::BIGINT % d` /
    * `('0x' || substr(md5(shingle), 9, 1))::INT & 1`: the first 4 digest
    * bytes big-endian are the dimension hash and the high nibble of byte
    * 4 carries the sign bit. All-zero vector for shingle-less documents
    * (callers drop zero-norm rows before any cosine). */
  def embed(text: UTF8String, d: Int): ArrayData = {
    val sh = TextKernels.shingles(text, 3, distinct = true)
    val out = new Array[Double](d)
    val digest = md.get()
    var i = 0
    val n = sh.numElements()
    while (i < n) {
      digest.reset()
      val b = digest.digest(sh.getUTF8String(i).getBytes)
      val h = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
        ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
      val dim = (h % d).toInt
      val sign = (((b(4) >> 4) & 1) << 1) - 1
      out(dim) += sign
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_feature_hash",
      exprs => FeatureHashExpr(exprs(0), exprs(1)), "built-in")

  /** Column API: d-dim feature-hashed embedding of `text`. */
  def apply(spark: SparkSession, text: Column, d: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_feature_hash", text, org.apache.spark.sql.functions.lit(d))
  }
}
