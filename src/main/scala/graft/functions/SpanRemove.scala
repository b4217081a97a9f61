package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-join of the tokens NOT covered by any span — the span-removal
  * kernel behind [[graft.ext.SpanDedup]]. Inputs are a token array and a
  * position-sorted array of DISJOINT spans (struct<s:int, e:int>, end
  * inclusive — the island-merge guarantees both properties), so one
  * two-pointer merge walk emits the clean text in O(tokens + spans) with
  * no per-token span scan. The former formulation exploded every token
  * row, anti-joined on doc_id with the range test as a RESIDUAL (per-doc
  * tokens x spans comparisons inside one task — quadratic on a
  * degenerate corpus where spans_d ~ tokens_d / w), and re-assembled the
  * survivors through a corpus-wide collect_list shuffle; this kernel
  * replaces all three stages with a per-row projection. The loop lives
  * in a precompiled static (see [[VectorKernels]] for why inlining loops
  * into whole-stage codegen backfires). */
case class SpanRemoveJoin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_span_remove_join"

  override def nullSafeEval(t: Any, s: Any): Any =
    SpanRemove.join(t.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = graft.functions.SpanRemove.join($t, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanRemove {

  def join(toks: ArrayData, spans: ArrayData): UTF8String = {
    val nt = toks.numElements()
    val ns = spans.numElements()
    val kept = new java.util.ArrayList[UTF8String](nt)
    var i = 0
    var j = 0
    while (i < nt) {
      // spans are sorted and disjoint: once a span ends before the
      // current position it can never cover a later one
      while (j < ns && spans.getStruct(j, 2).getInt(1) < i) j += 1
      val covered = j < ns && {
        val sp = spans.getStruct(j, 2)
        sp.getInt(0) <= i && i <= sp.getInt(1)
      }
      if (!covered) kept.add(toks.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(
      UTF8String.fromString(" "), kept.toArray(new Array[UTF8String](0)): _*)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_span_remove_join",
      exprs => SpanRemoveJoin(exprs(0), exprs(1)), "built-in")

  def apply(spark: SparkSession, toks: Column, spans: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_span_remove_join", toks, spans)
  }
}
