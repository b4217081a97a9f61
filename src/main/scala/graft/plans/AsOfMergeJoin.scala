package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Catalyst-native as-of join (SURVEY.md §2.3 J1/J2 — the roadmap's
  * "custom SparkPlan" milestone): a first-class logical operator planned to
  * a co-partitioned, sort-merge physical node.
  *
  * Compared to the union-merge formulation in [[graft.ops.AsOfJoin]] (one
  * shuffle over probes+versions, window `last()`), this plays Catalyst's
  * own game: EnsureRequirements provides hash co-partitioning + per-key
  * (key, time) sort for BOTH children — so a pre-partitioned/bucketed input
  * needs NO shuffle at all and AQE handles skew/coalescing — and the merge
  * itself is a streaming two-pointer pass per partition: each version row
  * is visited exactly once, no row widening to a union schema, no window
  * buffering. Semantics are identical (inclusive/exclusive boundary, LEFT
  * null production, last-version-wins at equal change instants) and pinned
  * against [[graft.ops.AsOfJoin.asof]] in AsOfMergeSpec.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    inclusive: Boolean,
    inner: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // claim BOTH children's full outputs so generic column-pruning keeps the
  // probe payload columns (they pass straight through to `output`)
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node onto the physical merge join.
  * Register per session via [[GraftPlanner.ensure]] (experimental methods)
  * or globally with `spark.sql.extensions=graft.plans.GraftSparkExtensions`. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, vals, inc, inner) =>
      AsOfMergeJoinExec(lk, lt, rk, rt, vals, inc, inner, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object GraftPlanner {
  /** Idempotently add the as-of strategy to a session's planner. */
  def ensure(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfStrategy))
      em.extraStrategies = em.extraStrategies :+ AsOfStrategy
  }
}

/** `spark.sql.extensions` entry point (cluster-wide registration). */
class GraftSparkExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsOfStrategy)
}

/** Physical as-of merge join.
  *
  * Child requirements do the heavy lifting: ClusteredDistribution on the
  * join key (EnsureRequirements inserts compatible hash exchanges, or NONE
  * when a child is already partitioned that way) and (key, time) ascending
  * sort per partition. The merge is then a single forward pass: versions
  * are consumed monotonically per key, holding only the latest visible
  * version row — O(1) state, every input row touched once.
  */
case class AsOfMergeJoinExec(
    leftKey: Attribute,
    leftTime: Attribute,
    rightKey: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    inclusive: Boolean,
    inner: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // probes are emitted in their incoming per-partition order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  /** Types whose InternalRow storage is an unboxed long (getLong-safe). */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType => true
    case org.apache.spark.sql.types.TimestampType => true
    case org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lkIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    val inc = inclusive
    val innerJoin = inner
    val nRight = rOut.length
    // the overwhelmingly common shape (bigint entity key, timestamp time)
    // merges over unboxed longs; anything else takes the generic path whose
    // interpreted orderings allocate a box per comparison
    val primitive = longBacked(leftKey.dataType) && longBacked(leftTime.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // bind the version side as NULLABLE regardless of its schema: the
      // LEFT-join null row must project as NULL, and a non-nullable
      // BoundReference would skip the isNullAt check and read zeros
      val proj = UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight: InternalRow = new GenericInternalRow(nRight)

      if (primitive) {
        // ---- unboxed long merge (key and time read via getLong) ----------
        var rHas = false
        var rKey = 0L
        var rTime = 0L
        var rRow: InternalRow = null
        def advanceR(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val row = rIter.next()
            if (!row.isNullAt(rkIdx) && !row.isNullAt(rtIdx)) {
              // primitives are safe to read off the live buffer, but the
              // held row itself must be a copy (the iterator reuses it)
              rRow = row.copy()
              rKey = row.getLong(rkIdx)
              rTime = row.getLong(rtIdx)
              rHas = true
            }
          }
        }
        advanceR()
        var heldValid = false
        var heldKey = 0L
        var heldRow: InternalRow = null
        lIter.flatMap { lRow =>
          if (lRow.isNullAt(lkIdx) || lRow.isNullAt(ltIdx)) {
            if (innerJoin) Iterator.empty
            else Iterator.single(proj(joined(lRow, nullRight)))
          } else {
            val pKey = lRow.getLong(lkIdx)
            val pTime = lRow.getLong(ltIdx)
            while (rHas && rKey < pKey) advanceR()
            while (rHas && rKey == pKey &&
                (if (inc) rTime <= pTime else rTime < pTime)) {
              heldValid = true; heldKey = rKey; heldRow = rRow
              advanceR()
            }
            val matched = heldValid && heldKey == pKey
            if (matched) Iterator.single(proj(joined(lRow, heldRow)))
            else if (innerJoin) Iterator.empty
            else Iterator.single(proj(joined(lRow, nullRight)))
          }
        }
      } else {
        // ---- generic merge (interpreted orderings over boxed values) -----
        val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
        val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
        val rkType = rOut(rkIdx).dataType
        val rtType = rOut(rtIdx).dataType
        val lkType = lOut(lkIdx).dataType
        val ltType = lOut(ltIdx).dataType

        // buffered right cursor; NULL-key / NULL-time versions are inert
        // under SQL equi-join semantics and skipped outright
        var rHas = false
        var rKey: Any = null
        var rTime: Any = null
        var rRow: InternalRow = null
        def advanceR(): Unit = {
          rHas = false
          while (!rHas && rIter.hasNext) {
            val row = rIter.next()
            if (!row.isNullAt(rkIdx) && !row.isNullAt(rtIdx)) {
              // copy FIRST and extract key/time from the copy: iterator rows
              // are reused buffers, and a UTF8String/binary/decimal key read
              // off the live row would silently mutate after the next next()
              rRow = row.copy()
              rKey = rRow.get(rkIdx, rkType)
              rTime = rRow.get(rtIdx, rtType)
              rHas = true
            }
          }
        }
        advanceR()

        // latest version already consumed (valid while its key matches)
        var heldValid = false
        var heldKey: Any = null
        var heldRow: InternalRow = null

        lIter.flatMap { lRow =>
          if (lRow.isNullAt(lkIdx) || lRow.isNullAt(ltIdx)) {
            // NULL-key (or NULL as-of time) probe: never matches
            if (innerJoin) Iterator.empty
            else Iterator.single(proj(joined(lRow, nullRight)))
          } else {
            val pKey = lRow.get(lkIdx, lkType)
            val pTime = lRow.get(ltIdx, ltType)
            // drop versions for keys already passed
            while (rHas && keyOrd.compare(rKey, pKey) < 0) advanceR()
            // consume versions visible at pTime; last one wins (equal change
            // instants: later stream position wins, same as the window form)
            while (rHas && keyOrd.compare(rKey, pKey) == 0 && {
                val c = timeOrd.compare(rTime, pTime)
                if (inc) c <= 0 else c < 0
              }) {
              heldValid = true; heldKey = rKey; heldRow = rRow
              advanceR()
            }
            val matched = heldValid && keyOrd.compare(heldKey, pKey) == 0
            if (matched) Iterator.single(proj(joined(lRow, heldRow)))
            else if (innerJoin) Iterator.empty
            else Iterator.single(proj(joined(lRow, nullRight)))
          }
        }
      }
    }
  }
}
