package graft

import graft.core.{EventTable, VersionedTable}
import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def versions(): VersionedTable = {
    import spark.implicits._
    val df = Seq(
      (ts("01:00"), "k1", 10L),
      (ts("02:00"), "k1", 20L),
      (ts("03:00"), "k1", 30L),
      (ts("01:30"), "k2", 5L)
    ).toDF("_change_time", "_entity", "v")
    VersionedTable(df, "_entity", "_change_time", Seq("v"))
  }

  private def probes(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (t, k) => (ts(t), k) }.toDF("t", "k")
  }

  private def collect(df: DataFrame): Set[(String, String, Option[Long])] =
    df.collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString.substring(11, 16),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet

  test("inclusive boundary: version at exactly asOf time is visible") {
    val got = collect(AsOfJoin.asof(probes(("02:00", "k1")), "k", "t", versions()))
    assert(got === Set(("k1", "02:00", Some(20L))))
  }

  test("exclusive variant hides the version at the boundary") {
    val got = collect(
      AsOfJoin.asof(probes(("02:00", "k1")), "k", "t", versions(), inclusive = false))
    assert(got === Set(("k1", "02:00", Some(10L))))
  }

  test("probe between versions picks the latest preceding one") {
    val got = collect(AsOfJoin.asof(probes(("02:30", "k1")), "k", "t", versions()))
    assert(got === Set(("k1", "02:30", Some(20L))))
  }

  test("LEFT semantics: probe before any version survives with NULL") {
    val got = collect(AsOfJoin.asof(
      probes(("00:30", "k1"), ("00:30", "zz")), "k", "t", versions()))
    assert(got === Set(("k1", "00:30", None), ("zz", "00:30", None)))
  }

  test("inner join drops version-less probes") {
    val got = collect(AsOfJoin.asof(
      probes(("00:30", "k1"), ("02:00", "k1")), "k", "t", versions(), joinType = "inner"))
    assert(got === Set(("k1", "02:00", Some(20L))))
  }

  test("duplicate probes at the same instant all get the same version") {
    val got = AsOfJoin.asof(
      probes(("02:00", "k1"), ("02:00", "k1"), ("04:00", "k1")), "k", "t", versions())
    assert(got.count() === 3)
    assert(collect(got) === Set(("k1", "02:00", Some(20L)), ("k1", "04:00", Some(30L))))
  }

  test("point-in-time immutability: appending later events never changes asOf") {
    import spark.implicits._
    // events for k1 up to 03:00; appending an event at 05:00 must not
    // change any asOf at t <= 04:00 (the author's invariant, App.java:29-33)
    val base = Seq((ts("01:00"), "k1", 1), (ts("02:00"), "k1", 2), (ts("03:00"), "k1", 3))
    val extended = base :+ ((ts("05:00"), "k1", 100))
    def feats(rows: Seq[(java.sql.Timestamp, String, Int)]) =
      VersionedTable.fromEvents(
        EventTable(rows.toDF("ts", "k", "x"), "ts", Some("k")), "k",
        sum(col("x")) -> "s")
    val p = probes(("01:00", "k1"), ("02:30", "k1"), ("04:00", "k1"))
    val a = AsOfJoin.asof(p, "k", "t", feats(base)).collect().map(_.toSeq).toSet
    val b = AsOfJoin.asof(p, "k", "t", feats(extended)).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("asofBroadcast equals the union-merge asof (left and inner, both boundaries)") {
    val p = probes(("00:30", "k1"), ("01:00", "k1"), ("02:30", "k1"),
      ("04:00", "k1"), ("01:30", "k2"), ("09:00", "zz"))
    for (inc <- Seq(true, false); jt <- Seq("left", "inner")) {
      val viaShuffle = AsOfJoin.asof(p, "k", "t", versions(), inc, jt)
        .collect().map(_.toSeq).toSet
      val viaBroadcast = AsOfJoin.asofBroadcast(p, "k", "t", versions(), inc, jt)
        .collect().map(_.toSeq).toSet
      assert(viaShuffle === viaBroadcast, s"inclusive=$inc joinType=$jt")
    }
  }

  test("nullKeyBypass routes NULL-key probes around the shuffle with equal results") {
    import spark.implicits._
    val p = Seq((ts("02:00"), "k1"), (ts("02:00"), null), (ts("04:00"), null))
      .toDF("t", "k")
    val plain = AsOfJoin.asof(p, "k", "t", versions()).collect().map(_.toSeq).toSet
    val bypass = AsOfJoin.asof(p, "k", "t", versions(), nullKeyBypass = true)
      .collect().map(_.toSeq).toSet
    assert(plain === bypass)
    assert(bypass.size === 3)
    val inner = AsOfJoin.asof(p, "k", "t", versions(), joinType = "inner",
      nullKeyBypass = true).collect()
    assert(inner.length === 1)
  }

  test("ties at the same change instant collapse to the full cumulative value") {
    import spark.implicits._
    val events = Seq(
      (ts("01:00"), "k1", 1), (ts("01:00"), "k1", 2), (ts("01:00"), "k1", 4))
      .toDF("ts", "k", "x")
    val vt = VersionedTable.fromEvents(EventTable(events, "ts", Some("k")), "k",
      sum(col("x")) -> "s")
    assert(vt.df.count() === 1)
    val got = collect(AsOfJoin.asof(probes(("01:00", "k1")), "k", "t", vt)
      .select(col("t"), col("k"), col("s")))
    assert(got === Set(("k1", "01:00", Some(7L))))
  }
}
