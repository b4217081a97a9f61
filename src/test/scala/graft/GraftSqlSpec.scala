package graft

import graft.api.Graft
import org.scalatest.funsuite.AnyFunSuite

/** The reference's SQL runs near-verbatim: its example query is plain SQL
  * (spark.sql handles TIMESTAMPADD/NULLIF/OVER), and its two
  * FOR SYSTEM_TIME AS OF temporal joins (App.java:200-205, 228-233) run
  * through Graft.sql against registered versioned tables. */
class GraftSqlSpec extends AnyFunSuite with SparkSpec {

  test("reference SQL program end-to-end through Graft.sql") {
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

    // feature query (App.java:47) / target query (App.java:52), versioned
    g.registerVersioned("Features",
      g.versionedWhere(games, "won = false", "sum(duration)" -> "loss_duration"))
    g.registerVersioned("Target", g.versioned(purchases, "count(1)" -> "cnt"))

    // example query — the reference's SQL text (App.java:64-77), verbatim
    // except Spark's subquery-alias requirement
    g.sql("""
      SELECT user AS _entity, ts AS _prediction_time,
             TIMESTAMPADD(HOUR, 1, ts) AS _label_time
      FROM (SELECT *, count(NULLIF(won, true)) OVER (
              PARTITION BY user ORDER BY ts
              ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS defeat_count
            FROM GamePlay) t
      WHERE defeat_count = 2
    """).createOrReplaceTempView("example")

    // temporal join #1 (App.java:200-205)
    g.sql("""
      SELECT example.*, features.loss_duration
      FROM example
      LEFT JOIN Features FOR SYSTEM_TIME AS OF example._prediction_time AS features
      ON example._entity = features._entity
    """).createOrReplaceTempView("example_with_features")

    // temporal join #2 on the second time axis (App.java:228-233)
    val result = g.sql("""
      SELECT example_with_features.*, target.cnt
      FROM example_with_features
      LEFT JOIN Target FOR SYSTEM_TIME AS OF example_with_features._label_time AS target
      ON example_with_features._entity = target._entity
    """)

    val got = result.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === Set(
      ("Bob", ts("03:46"), ts("04:46"), 11L, 1L),
      ("Alice", ts("08:35"), ts("09:35"), 7L, 2L)))
  }
}
