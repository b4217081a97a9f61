package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence pattern detection (MATCH_RECOGNIZE-lite): the funnel /
  * attribution shape — "did a view lead to a click lead to a purchase,
  * each step within T of the one before?" — expressed as CASCADED
  * running-max windows rather than self-joins.
  *
  * Per key, ordered by (ts, tie), stage 0's qualifying time is the
  * running max ts of step-0 rows; a stage-i row QUALIFIES when its type
  * is steps(i) and it falls within `within` of stage i-1's qualifying
  * time at that row; its running max ts becomes stage i's qualifying
  * time. The greedy last-touch semantics (each step matches the MOST
  * RECENT qualifying prior step) is the standard attribution rule.
  *
  * Scale shape: every stage is a window over the SAME (key, order), so
  * Catalyst plans ONE exchange on the key and one sort, with all k
  * Window operators stacked on top — per-event cost is O(k) comparisons,
  * no join, no explosion, no state beyond the running maxes. The final
  * per-key aggregation reuses the same partitioning (no second
  * exchange). A self-join formulation (events x events within T) would
  * be quadratic per hot key; this is the form that survives 100 TB of
  * events. */
object EventPatterns {

  /** Per-key funnel counts over `steps` event types. Input needs
    * (key, tsCol, tieCol, typeCol). Output: (key, n_step_0 ..
    * n_step_k-1, n_qual_1 .. n_qual_k-1) — raw occurrences per step
    * type, and qualified counts per non-root stage (n_qual_i = steps(i)
    * rows within `within` of a qualified stage i-1 row; the last one is
    * the funnel's conversion count). */
  def funnelCounts(
      events: DataFrame, steps: Seq[String], within: String = "1 HOUR",
      key: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id", typeCol: String = "event_type")
      : DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    // EXCLUSIVE frame (up to the previous row): a row may only qualify
    // against STRICTLY EARLIER rows in (ts, tie) order. With an inclusive
    // frame a row whose type matches both steps(i-1) and steps(i) — a
    // same-type consecutive-step funnel — would qualify against itself.
    // For all-distinct step types the two frames are equivalent (the
    // current row contributes null to the other step's running max), and
    // the exclusive form matches StreamingFunnel's check-state-before-
    // update replay exactly.
    val w = Window.partitionBy(key).orderBy(tsCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col(tsCol)
    def inWindow(prevQ: Column): Column =
      prevQ.isNotNull && t <= prevQ + expr(s"INTERVAL $within")
    // stage qualifying times q0..q_{k-1}, each one window over the same
    // (key, order) — Catalyst stacks them on a single exchange + sort
    var df = events
      .withColumn("q0",
        max(when(col(typeCol) === steps.head, t)).over(w))
    val qualFlags = (1 until steps.size).map { i =>
      val flag = col(typeCol) === steps(i) && inWindow(col(s"q${i - 1}"))
      df = df.withColumn(s"q$i", max(when(flag, t)).over(w))
      s"qual_$i" -> flag
    }
    qualFlags.foreach { case (name, flag) =>
      df = df.withColumn(name, flag)
    }
    val stepCounts = steps.zipWithIndex.map { case (s, i) =>
      count(when(col(typeCol) === s, 1)).as(s"n_step_$i")
    }
    val qualCounts = (1 until steps.size).map { i =>
      count(when(col(s"qual_$i"), 1)).as(s"n_qual_$i")
    }
    df.groupBy(key).agg(stepCounts.head,
      (stepCounts.tail ++ qualCounts): _*)
  }
}
