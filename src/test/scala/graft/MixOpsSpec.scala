package graft

import graft.ext.{MixOps, PipelineOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("shardAssign: total, determinism, balance, dense positions") {
    val a = MixOps.shardAssign(docs, 8).collect()
    assert(a.length === docs.count())
    // deterministic across invocations (the md5 order is the contract)
    val b = MixOps.shardAssign(docs, 8).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      === b.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1))
    // every shard in range and populated; positions dense from 1
    val byShard = a.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to rows.length))
    }
    // hash balance: no shard more than 3x the mean (md5 is uniform)
    val mean = a.length / 8.0
    assert(byShard.values.forall(_.length <= 3 * mean))
  }

  test("globalRank == naive global window, incl. negative scores and a " +
      "score-homogeneous corpus (sub-split path)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // scores straddling zero and bucket boundaries (floor-div, not trunc)
    val mixed = Seq(
      (1L, 5000L), (2L, -5000L), (3L, 0L), (4L, 4096L), (5L, -4096L),
      (6L, 4095L), (7L, -1L), (8L, 123456L), (9L, -123456L), (10L, 5000L))
      .toDF("doc_id", "score")
    def naive(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val gotMixed = MixOps.globalRank(mixed)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotMixed === naive(mixed))
    // homogeneous: every row in ONE bucket forces the sub-split path;
    // ranks still exactly the naive window's
    val flat = (1L to 400L).map(i => (i, 1000L + (i % 3))).toDF("doc_id", "score")
    val gotFlat = MixOps.globalRank(flat, maxBucketRows = 50L, subSplits = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotFlat === naive(flat))
    assert(gotFlat.values.toSeq.sorted === (1L to 400L))
  }

  test("writeShards: shard dirs match shardAssign; in-file row order is " +
      "the shuffle order") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = 4
    val path = java.nio.file.Files.createTempDirectory("shards").toString
    val written = MixOps.writeShards(docs, n, path)
    assert(written === docs.count())
    val expected = MixOps.shardAssign(docs, n).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until n).foreach { k =>
      val dir = new java.io.File(s"$path/shard=$k")
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $k: one file per shard dir")
      val rows = spark.read.parquet(files(0).getPath)
        .select("doc_id", "m").collect()
      // membership: exactly the docs shardAssign routes here
      assert(rows.map(_.getLong(0)).toSet ===
        expected.filter(_._2 == k).keySet)
      // in-file order IS the md5-shuffle order
      val ms = rows.map(_.getString(1)).toSeq
      assert(ms === ms.sorted, s"shard $k rows not in shuffle order")
    }
  }

  test("packContexts: per-shard streams are contiguous and gapless") {
    val rows = MixOps.packContexts(docs, 4, 64)
      .orderBy("shard", "start_ctx", "doc_id").collect()
    rows.foreach { r =>
      val (ntok, start, end, nctx) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(start <= end && nctx === end - start + 1)
      // a doc spans at most ceil(ntok/64)+1 contexts (alignment slack 1)
      assert(nctx <= (ntok + 63) / 64 + 1)
    }
    // within a shard, consecutive docs' context ranges chain: next start
    // is the previous end (window shared) or end+1 (cut at boundary)
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getLong(3), r.getLong(4)))
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getLong(3) === p.getLong(4) ||
            n.getLong(3) === p.getLong(4) + 1)
        case _ =>
      }
      // the shard's token total implies its context count exactly
      val total = rs.map(_.getLong(2)).sum
      val lastCtx = rs.map(_.getLong(4)).max
      assert(lastCtx === (total - 1) / 64)
    }
  }

  test("temperatureSample: quota law, determinism, and flattening") {
    val out = MixOps.temperatureSample(docs, "source", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = out.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      val quota = math.min(counts(src),
        math.ceil(2 * math.sqrt(counts(src).toDouble)).toLong)
      assert(rows.head._3 === quota)
      assert(rows.length === quota,
        s"$src: got ${rows.length}, want $quota of ${counts(src)}")
    }
    // flattening: sample share of a source is smaller than its corpus share
    // whenever the source is large enough for the sqrt to bite
    counts.filter(_._2 > 16).foreach { case (src, cnt) =>
      assert(bySource(src).length.toDouble / out.length < cnt.toDouble /
        counts.values.sum * 1.5)
    }
    val again = MixOps.temperatureSample(docs, "source", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("repetitionScore flags a degenerate doc; clean docs keep") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog tonight"))
      .toDF("doc_id", "text")
    val out = PipelineOps.repetitionScore(crafted)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(5))).toMap
    val (uniq1, topbg1, keep1) = out(1L)
    assert(uniq1 === 0.1 && topbg1 === 1.0 && !keep1)
    val (uniq2, topbg2, keep2) = out(2L)
    assert(uniq2 === 1.0 && topbg2 < 0.2 && keep2)
  }

  test("repetitionScore: per-row ratios match a brute-force recount") {
    val out = PipelineOps.repetitionScore(docs).collect()
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    out.take(50).foreach { r =>
      val toks = "[a-z0-9]+".r.findAllIn(texts(r.getLong(0)).toLowerCase).toSeq
      assert(r.getLong(1) === toks.length)
      assert(math.abs(r.getDouble(2) - toks.distinct.length.toDouble / toks.length) < 1e-12)
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val top = bigrams.groupBy(identity).values.map(_.size).max
      assert(math.abs(r.getDouble(3) - top.toDouble / bigrams.length) < 1e-12)
    }
  }

  test("urlDomainStats: census covers all injected sites, blocklist hits") {
    val out = PipelineOps.urlDomainStats(docs, graft.queries.Mix.Blocklist)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val n = docs.count()
    assert(out.map(_._2).sum === n)
    assert(out.forall(_._1.matches("site[0-9]+\\.example\\.com")))
    assert(out.count(_._3) === out.count(r =>
      graft.queries.Mix.Blocklist.contains(r._1)))
    assert(out.exists(_._3) && out.exists(!_._3))
  }

  test("selectUnderBudget: distributed prefix sum == naive global window") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val budget = 1500L
    val got = MixOps.selectUnderBudget(docs, budget)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.nonEmpty)
    // naive reference: global (q desc, doc_id) order, running token sum
    val order = got.sortBy(r => (-r._2, r._1))
    var cum = 0L
    order.foreach { r =>
      cum += r._3
      assert(r._4 === cum, s"cum_tokens mismatch for doc ${r._1}")
      assert(r._5 === (cum <= budget))
    }
    // a budget that bites: some selected, some not
    assert(got.exists(_._5) && got.exists(!_._5))
    // selected set is a PREFIX of the quality order
    val flags = order.map(_._5)
    assert(!flags.dropWhile(identity).contains(true))
  }

  test("selectUnderBudget: constant-quality corpus sub-splits, stays exact") {
    // every doc identical -> one q value -> every row lands in ONE
    // quality bucket; with maxBucketRows forcing the sub-split the
    // running sum must decompose over doc_id ranges and still equal the
    // naive global window exactly
    import spark.implicits._
    val docs = (0L until 200L)
      .map(i => (i, "the cat sat on the mat and the dog ran off"))
      .toDF("doc_id", "text")
    val budget = 600L
    val got = MixOps.selectUnderBudget(
        docs, budget, maxBucketRows = 16L, subSplits = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.length === 200)
    assert(got.map(_._2).distinct.length === 1, "corpus must be single-q")
    val order = got.sortBy(r => (-r._2, r._1))
    var cum = 0L
    order.foreach { r =>
      cum += r._3
      assert(r._4 === cum, s"cum_tokens mismatch for doc ${r._1}")
      assert(r._5 === (cum <= budget))
    }
    assert(got.exists(_._5) && got.exists(!_._5))
    // the split genuinely produced multiple doc_id-range groups: with
    // rangeWidth = maxId/8 + 1 the 200 dense ids span several ranges
    val rangeWidth = 199L / 8 + 1
    assert(got.map(_._1 / rangeWidth).distinct.length > 4)
  }

  test("dsirSelect: toy corpus ranks target-vocabulary docs on top, " +
      "exact n rows, deterministic") {
    import spark.implicits._
    // docs 1-2 share the target's vocabulary; 3-4 use disjoint tokens.
    val d = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "beta gamma alpha gamma", "en"),
      (3L, "uno dos tres cuatro cinco", "es"),
      (4L, "eins zwei drei vier", "de"))
      .toDF("doc_id", "text", "lang")
    val sel = MixOps.dsirSelect(d, col("lang") === "en", 2).collect()
    assert(sel.map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(sel.forall(_.getBoolean(2)))
    // scores are positive for target-like docs (more likely under target)
    assert(sel.forall(_.getLong(1) > 0))
    val again = MixOps.dsirSelect(d, col("lang") === "en", 2).collect()
    assert(sel.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("dsirSelect on real data: selection shifts toward the target " +
      "distribution's over-represented tokens") {
    // the synthetic corpus shares one 31-token vocabulary across langs
    // (lang is an independent column), so the discriminative target here
    // is token-defined: docs mentioning 'spark'. Selected docs must then
    // be spark-denser than the corpus average — the importance weights
    // fire on the distribution shift, not on a metadata accident.
    val tgt = lower(col("text")).contains("spark")
    val sel = MixOps.dsirSelect(docs, tgt, 50)
    assert(sel.count() === 50)
    def sparkDensity(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df
        .select(
          size(filter(graft.ext.TextOps.tokens(col("text")),
            t => t === "spark")).cast("double").as("ns"),
          size(graft.ext.TextOps.tokens(col("text"))).cast("double").as("n"))
        .agg(sum(col("ns")), sum(col("n"))).first()
      r.getDouble(0) / r.getDouble(1)
    }
    val selDocs = sel.join(docs, "doc_id")
    assert(sparkDensity(selDocs) > sparkDensity(docs) * 1.2,
      "selected docs are not spark-denser than the corpus")
  }
}
