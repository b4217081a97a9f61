package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that is MARKED non-deterministic (it is not):
  * pins the enclosing Filter where it was written, because the optimizer
  * may not push, duplicate, or constant-fold a non-deterministic
  * predicate (the spark_optimization_guide §4.4 technique, applied to
  * native expressions instead of Python UDFs).
  *
  * Why this exists: a filter over an expensive DERIVED column — e.g.
  * `where(nrm > 0)` with nrm = sqrt(dot(FeatureHash(text)..)) — is
  * substituted and pushed below the [[graft.ext.Dedup]] spread
  * repartition into the scan, so the kernel runs once in the (single-task
  * for a local one-row-group file) scan-side filter and AGAIN in the
  * post-exchange projection. Wrapping the predicate keeps it above the
  * projection: one evaluation, at shuffle parallelism. Values are
  * untouched (identity on the child), so results are byte-identical;
  * only the plan placement changes.
  *
  * Use sparingly — a pinned predicate also blocks LEGITIMATE pushdown,
  * so wrap only predicates whose recomputation below the exchange is the
  * dominant cost (guide §4.4's "expensive UDFs, not blanket" rule).
  *
  * Positional constraint: because the expression CLAIMS to be
  * non-deterministic, CheckAnalysis only admits it in Project, Filter,
  * Aggregate and Window operators — a barrier-wrapped column used
  * DIRECTLY in a join condition, sort order, or groupBy key fails
  * analysis, and CollapseProject / common-subexpression elimination stop
  * firing around it. Materialize the wrapped value to a plain attribute
  * (one .select/.withColumn) before using it in keys or ordering. */
case class PlanBarrier(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_plan_barrier"

  // the whole point: opt out of push/duplicate/fold. The expression is
  // genuinely deterministic in VALUE, so retries and speculative tasks
  // reproduce identical rows regardless of partitioning.
  override lazy val deterministic: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlanBarrier {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_plan_barrier", exprs => PlanBarrier(exprs(0)), "built-in")

  /** Wrap a Column's expression; see the class scaladoc. */
  def apply(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_plan_barrier", c)
  }
}
