package graft

import graft.api.Graft
import org.scalatest.funsuite.AnyFunSuite

/** The facade reproduces the reference's golden output with a program
  * that ports App.java statement for statement. */
class GraftApiSpec extends AnyFunSuite with SparkSpec {

  test("reference program via the Graft facade yields App.java:80-81") {
    import spark.implicits._
    val g = Graft(spark)

    val gamesDf = Seq(
      ("02:30", "Alice", 10, true), ("02:35", "Bob", 3, false),
      ("03:46", "Bob", 8, false), ("03:58", "Bob", 23, true),
      ("04:25", "Bob", 8, true), ("05:05", "Alice", 53, true),
      ("05:36", "Alice", 2, false), ("07:22", "Bob", 7, false),
      ("08:35", "Alice", 5, false), ("10:01", "Alice", 43, true)
    ).map { case (t, u, d, w) => (ts(t), u, d, w) }.toDF("ts", "user", "duration", "won")
    val purchasesDf = Seq(("01:02", "Alice"), ("01:35", "Alice"), ("03:51", "Bob"))
      .map { case (t, u) => (ts(t), u) }.toDF("ts", "user")

    val games = g.events("GamePlay", gamesDf, time = "ts", key = "user")
    val purchases = g.events("Purchase", purchasesDf, time = "ts", key = "user")

    val features = g.versionedWhere(games, where = "won = false",
      "sum(duration)" -> "loss_duration")
    val target = g.versioned(purchases, "count(1)" -> "cnt")
    val examples = g.examples(games,
      windowAgg = "count(nullif(won, true))", lookback = 1,
      trigger = "= 2", labelDelay = "INTERVAL 1 HOUR")

    val training = g.pointInTimeJoin(
      g.pointInTimeJoin(examples, "_prediction_time", features),
      "_label_time", target)

    val got = training.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      ("Bob", ts("03:46"), ts("04:46"), 11L, 1L),
      ("Alice", ts("08:35"), ts("09:35"), 7L, 2L)))
  }
}
