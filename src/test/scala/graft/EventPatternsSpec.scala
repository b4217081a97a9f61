package graft

import graft.ops.EventPatterns
import org.scalatest.funsuite.AnyFunSuite

class EventPatternsSpec extends AnyFunSuite with SparkSpec {

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "mins", "user_id", "event_type")
      .selectExpr("event_id", "user_id", "event_type",
        "timestamp_micros(mins * 60000000) AS ts")
  }

  test("funnelCounts: qualified steps, per-step windows, last-touch") {
    val events = ev(
      // user 1: clean view -> click(30m) -> purchase(45m after click)
      (1L, 0L, 1L, "view"), (2L, 30L, 1L, "click"),
      (3L, 75L, 1L, "purchase"),
      // user 2: click with NO prior view, then purchase — nothing converts
      (4L, 10L, 2L, "click"), (5L, 20L, 2L, "purchase"),
      // user 3: click 90m after the view (outside 1h) — unqualified,
      // so the purchase cannot convert either
      (6L, 0L, 3L, "view"), (7L, 90L, 3L, "click"),
      (8L, 100L, 3L, "purchase"),
      // user 4: boundary — click exactly 60m after view QUALIFIES
      // (inclusive), purchase exactly 60m after the click converts
      (9L, 0L, 4L, "view"), (10L, 60L, 4L, "click"),
      (11L, 120L, 4L, "purchase"))
    val got = EventPatterns.funnelCounts(
        events, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got(1L) === ((1L, 1L, 1L, 1L, 1L)))
    assert(got(2L) === ((0L, 1L, 1L, 0L, 0L)))
    assert(got(3L) === ((1L, 1L, 1L, 0L, 0L)))
    assert(got(4L) === ((1L, 1L, 1L, 1L, 1L)))
  }

  test("funnelCounts: same-type consecutive steps never self-qualify") {
    // funnel view -> view -> purchase: a single view must NOT satisfy
    // both steps by qualifying against itself (the inclusive-frame bug);
    // two views in order DO cascade.
    val events = ev(
      // user 1: one view then a purchase — stage 1 has no earlier view,
      // so the purchase cannot convert
      (1L, 0L, 1L, "view"), (2L, 30L, 1L, "purchase"),
      // user 2: two views 10m apart then a purchase — second view
      // qualifies via the first, purchase converts via the second
      (3L, 0L, 2L, "view"), (4L, 10L, 2L, "view"),
      (5L, 40L, 2L, "purchase"))
    val got = EventPatterns.funnelCounts(
        events, Seq("view", "view", "purchase"))
      .orderBy("user_id").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // (n_step_0=views, n_step_1=views, n_step_2=purchases, n_qual_1, n_qual_2)
    assert(got(1L) === ((1L, 1L, 1L, 0L, 0L)))
    assert(got(2L) === ((2L, 2L, 1L, 1L, 1L)))
  }

  test("funnelCounts: last-touch greediness — a late second view re-opens " +
      "the click window; plan has ONE exchange") {
    val events = ev(
      (1L, 0L, 1L, "view"), (2L, 120L, 1L, "view"),
      (3L, 150L, 1L, "click"),      // within 1h of the SECOND view
      (4L, 170L, 1L, "purchase"))
    val out = EventPatterns.funnelCounts(
      events, Seq("view", "click", "purchase"))
    val row = out.collect()(0)
    assert(row.getLong(4) === 1L && row.getLong(5) === 1L)
    // one exchange total on the real table: the cascaded windows AND the
    // final aggregation all share the user_id partitioning
    val real = EventPatterns.funnelCounts(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"),
      Seq("view", "click", "purchase"))
    val exchanges = real.queryExecution.executedPlan.toString()
      .split("\n").count(_.contains("+- Exchange"))
    assert(exchanges === 1, s"expected 1 exchange, got $exchanges")
  }
}
