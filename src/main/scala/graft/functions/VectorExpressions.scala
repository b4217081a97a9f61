package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two array<double> columns.
  *
  * The composable alternative — aggregate(zip_with(a, b, _*_), 0.0, _+_) —
  * runs the lambda interpreter per element and allocates an intermediate
  * array; this expression is a tight codegen'd loop over the unsafe array
  * data. The accumulation order is the same sequential left-to-right fold,
  * so results are bit-identical to the HOF form (and to the DuckDB oracle).
  *
  * Null array elements are treated as 0 (embeddings carry none).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers must pass array<double> (cast first); Spark 4 hides the
  // ExpectsInputTypes/AbstractDataType machinery from external packages
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: several DotProducts can land in ONE codegen function
      // (e.g. the IVF cell assignment evaluates one per centroid) and
      // fixed locals would collide -> whole-stage codegen bailout
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 8-bit scalar quantization encoder: array<double> vector -> BinaryType
  * codes, code_d = round((x_d - lo_d) / step_d) clamped to [0, 255].
  * lo/step are per-dimension literal arrays (trained driver-side on a
  * sample — see [[graft.ext.Quantize]]). 8x smaller corpus vectors are the
  * point: at 100 TB the NN corpus becomes memory-resident 64 B/vector
  * instead of 512 B. */
case class SQ8Encode(vec: Expression, lo: Expression, step: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = lo
  override def third: Expression = step
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_sq8_encode"

  override def nullSafeEval(v: Any, l: Any, s: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val loA = l.asInstanceOf[ArrayData]
    val stA = s.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val st = stA.getDouble(i)
      val c =
        if (st == 0.0) 0L
        else Math.round((x.getDouble(i) - loA.getDouble(i)) / st)
      out(i) = Math.max(0L, Math.min(255L, c)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, s) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $st = $s.getDouble($i);
         |  long $c = $st == 0.0 ? 0L :
         |    java.lang.Math.round(($v.getDouble($i) - $l.getDouble($i)) / $st);
         |  $out[$i] = (byte) java.lang.Math.max(0L, java.lang.Math.min(255L, $c));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, lo = s, step = t)
}

/** Asymmetric quantized dot product: full-precision query vector against
  * SQ8 codes, dot = sum_d q_d * (lo_d + step_d * code_d). One codegen'd
  * loop over the byte array — the first-pass scorer for quantized NN;
  * exact re-ranking then touches only the surviving candidates. */
case class SQ8Dot(query: Expression, codes: Expression, lo: Expression, step: Expression)
    extends QuaternaryExpression {

  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = lo
  override def fourth: Expression = step
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  override def nullSafeEval(q: Any, c: Any, l: Any, s: Any): Any = {
    val qv = q.asInstanceOf[ArrayData]
    val cd = c.asInstanceOf[Array[Byte]]
    val loA = l.asInstanceOf[ArrayData]
    val stA = s.asInstanceOf[ArrayData]
    val n = Math.min(qv.numElements(), cd.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += qv.getDouble(i) * (loA.getDouble(i) + stA.getDouble(i) * (cd(i) & 0xff))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, l, s) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $c.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $q.getDouble($i) *
         |    ($l.getDouble($i) + $s.getDouble($i) * (double) ($c[$i] & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(query = f, codes = s, lo = t, step = q)
}

object VectorExpressions {

  /** Register the graft expressions in the session's function registry
    * (idempotent), making them available to both the Column API and
    * spark.sql. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sq8_encode", exprs => SQ8Encode(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sq8_dot", exprs => SQ8Dot(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

  def sq8Encode(spark: SparkSession, v: Column, lo: Column, step: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_sq8_encode", v, lo, step)
  }

  def sq8Dot(spark: SparkSession, q: Column, codes: Column, lo: Column, step: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_sq8_dot", q, codes, lo, step)
  }
}
