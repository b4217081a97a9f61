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

  test("facade changelog + replay reconstructs the batch aggregation") {
    import org.apache.spark.sql.functions._
    val g = Graft(spark)
    val sfDir = "/root/testdata/sf0.001"
    val stream = graft.sources.Tables.eventsStream(spark, sfDir)
      .where(col("event_type") === "purchase")
    val cl = g.changelog(stream, "ts", "0 seconds", Seq("user_id"),
      "count(1)" -> "purchases")
    assert(cl.columns.take(2).toSeq === Seq("op", "batch_id"))
    val replayed = g.replayChangelog(cl, Seq("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.sources.Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase")
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayed === batch)
  }

  test("facade dedup clusters and ANN delegate to the scale paths") {
    import org.apache.spark.sql.functions._
    val g = Graft(spark)
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val clusters = g.duplicateClusters(docs, 0.7)
    assert(clusters.columns.toSeq === Seq("doc_id", "cluster_root", "keep"))
    assert(clusters.count() === docs.count())
    val viaExt = graft.ext.Dedup.duplicateClusters(docs, 0.7)
      .collect().map(_.toSeq).toSet
    assert(clusters.collect().map(_.toSeq).toSet === viaExt)

    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val nn = g.approxNearestNeighbors(emb, col("vec_id") < 5, k = 3)
    val byProbe = nn.collect().groupBy(_.getLong(0))
    assert(byProbe.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(byProbe.values.forall(_.length == 3))
  }
}
