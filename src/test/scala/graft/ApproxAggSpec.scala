package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_approx_agg's distributed exact median (two-pass count+select,
  * graft.queries.Advanced.exactMedianByType) VALUE-FOR-VALUE against the
  * in-buffer `percentile(value, 0.5)` aggregate it replaced — on real
  * testdata (even/odd group counts, duplicated values) and on
  * interpolation edge cases the real data may not exercise. Exact
  * equality (===), not tolerance: the restructure replays Percentile's
  * interpolation arithmetic operand-for-operand, so any drift is a bug.
  */
class ApproxAggSpec extends AnyFunSuite with SparkSpec {

  private def check(ev: org.apache.spark.sql.DataFrame): Unit = {
    val ref = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("ref_median"))
    val got = graft.queries.Advanced.exactMedianByType(ev)
    val joined = ref.join(got, Seq("event_type"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val refM = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val gotM = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(refM === gotM, s"event_type=${r.getString(0)}")
    }
  }

  test("real events data: medians match percentile() exactly") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      check(graft.sources.Tables.events(spark, sf)
        .select("event_type", "value"))
    }
  }

  test("edge cases: odd/even n, duplicated medians, single row, nulls") {
    import spark.implicits._
    val ev = Seq(
      // odd count: exact middle value
      ("odd", Some(1.0)), ("odd", Some(5.0)), ("odd", Some(100.0)),
      // even count: interpolation between two distinct values
      ("even", Some(1.0)), ("even", Some(2.0)),
      ("even", Some(10.0)), ("even", Some(11.0)),
      // even count with the two middle values EQUAL (vhi == vlo branch)
      ("dupmid", Some(1.0)), ("dupmid", Some(7.0)),
      ("dupmid", Some(7.0)), ("dupmid", Some(9.0)),
      // all rows the same value
      ("const", Some(3.5)), ("const", Some(3.5)), ("const", Some(3.5)),
      // single row
      ("one", Some(42.0)),
      // nulls ignored alongside values
      ("mixed", None), ("mixed", Some(2.0)), ("mixed", Some(4.0)),
      ("mixed", None),
      // negative values and a zero
      ("neg", Some(-5.0)), ("neg", Some(0.0)),
      ("neg", Some(-1.0)), ("neg", Some(2.0))
    ).toDF("event_type", "value")
    check(ev)
  }
}
