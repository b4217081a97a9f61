package graft

import graft.ext.PipelineOps
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite with SparkSpec {

  test("hygienePipeline == the conjunction of its individually-oracled stages") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val got = PipelineOps.hygienePipeline(docs, col("doc_id") < 25)
      .collect().map(_.getLong(0)).toSet
    // reference: run each stage operator independently, intersect the keeps
    val en = graft.queries.Registry.queries("q_langid")(spark, dir)
      .where(col("predicted") === "en").collect().map(_.getLong(0)).toSet
    val qual = graft.queries.Registry.queries("q_quality")(spark, dir)
      .where(col("n_tokens") >= 20 && col("stop_ratio") >= 0.02)
      .collect().map(_.getLong(0)).toSet
    val minDf = math.max(3L, math.ceil(0.01 * docs.count()).toLong)
    val boil = PipelineOps.boilerplate(docs, minDf, 0.3)
      .where(col("keep")).collect().map(_.getLong(0)).toSet
    val surv = docs
      .select(col("doc_id"), graft.ext.TextOps.fingerprint(col("text")).as("f"))
      .groupBy("f").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clean = PipelineOps.decontaminate(docs, col("doc_id") < 25, 0.3)
      .where(!col("contaminated")).collect().map(_.getLong(0)).toSet
    val rep = PipelineOps.repetitionScore(docs)
      .where(col("top_bigram_frac") <= 0.2 && col("uniq_ratio") >= 0.3)
      .collect().map(_.getLong(0)).toSet
    val chars = graft.ext.TextOps.repetitionSignals(docs)
      .where(col("dup3_frac") <= 0.2).collect().map(_.getLong(0)).toSet
    val fit = graft.ext.TextOps.trigramRareRate(docs)
      .where(col("rare_rate") <= 0.2).collect().map(_.getLong(0)).toSet
    val hyg = en & qual & boil & surv & clean & rep & chars & fit
    // the final budget stage must rank exactly the hygiene survivors
    val sel = graft.ext.MixOps.selectUnderBudget(
        docs.where(col("doc_id").isInCollection(hyg)), 10000L)
      .where(col("selected")).collect().map(_.getLong(0)).toSet
    assert(got === (hyg & sel))
    assert(got.nonEmpty && !got.exists(_ < 25), "eval docs must never survive")
    assert(hyg.size > got.size, "the token budget must bite")
  }

  test("fused per-row hygiene signals == standalone operators, value-for-value") {
    // r21 fused the per-row stages into one projection; the conjunction
    // test above pins the KEEP SET, this pins the surfaced VALUES: every
    // signal column of the pipeline output must equal the standalone
    // operator's value for that doc (exact doubles — the expressions are
    // required to be copied verbatim, not re-derived)
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val got = PipelineOps.hygienePipeline(docs, col("doc_id") < 25)
    val rep = PipelineOps.repetitionScore(docs)
      .select(col("doc_id"), col("uniq_ratio").as("u2"), col("top_bigram_frac").as("t2"))
    val chars = graft.ext.TextOps.repetitionSignals(docs)
      .select(col("doc_id"), col("dup3_frac").as("d2"))
    val fit = graft.ext.TextOps.trigramRareRate(docs)
      .select(col("doc_id"), col("rare_rate").as("r2"))
    val joined = got.join(rep, "doc_id").join(chars, "doc_id").join(fit, "doc_id")
    val bad = joined.where(
      col("uniq_ratio") =!= col("u2") || col("top_bigram_frac") =!= col("t2") ||
      col("dup3_frac") =!= col("d2") || col("rare_rate") =!= col("r2")).count()
    assert(bad === 0L)
    assert(joined.count() > 0)
  }

  test("chunk kernel == HOF slice formulation on all sf0.001 documents") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val k = 16
    val toks = graft.ext.TextOps.tokens(col("text"))
    val hof = docs.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ceil(size(toks) / lit(k.toDouble)).cast("int") - 1),
        i => array_join(slice(toks, i * k + 1, lit(k)), " "))).as(Seq("pos", "chunk")))
      .where(size(toks) > 0)
    val kernel = docs.select(col("doc_id"),
      posexplode(graft.functions.TextKernels.chunkArray(
        spark, col("text"), k)).as(Seq("pos", "chunk")))
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
  }

  test("chunkDedup: exact duplicate docs have dup_ratio 1; unique docs 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // full dups (k=4)
      (3L, "p q r s t u v w")                            // unique
    ).toDF("doc_id", "text")
    val rows = PipelineOps.chunkDedup(docs, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows(1L) == ((2L, 2L, 1.0)))
    assert(rows(2L) == ((2L, 2L, 1.0)))
    assert(rows(3L) == ((2L, 0L, 0.0)))
  }

  test("boilerplate: shared shingle counted, keep respects threshold") {
    import spark.implicits._
    // "x y z" appears in all three docs -> df=3 >= minDf
    val docs = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f"),
      (3L, "x y z g h i")).toDF("doc_id", "text")
    // each doc: 4 distinct shingles, exactly one ("x y z") boilerplate
    val at = PipelineOps.boilerplate(docs, minDf = 3, maxRatio = 0.25)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(4)))
    at.foreach { case (n, b, keep) =>
      assert(n == 4L && b == 1L && keep) // ratio 0.25 <= 0.25 (inclusive)
    }
    val below = PipelineOps.boilerplate(docs, minDf = 3, maxRatio = 0.2)
      .collect().map(_.getBoolean(4))
    assert(below.forall(!_)) // 0.25 > 0.2 -> dropped
    val highDf = PipelineOps.boilerplate(docs, minDf = 4, maxRatio = 0.2)
      .collect().map(r => (r.getLong(2), r.getBoolean(4)))
    assert(highDf.forall { case (b, keep) => b == 0L && keep }) // df 3 < 4
  }

  test("redact masks emails and phones, counts them") {
    import spark.implicits._
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val row = PipelineOps.redactDemo(docs).collect().head
    assert(row.getLong(1) === 1L && row.getLong(2) === 1L)
    // fp equals md5 of the fully redacted injected string
    val expected = docs.select(md5(lit(
      "hello world contact <EMAIL> or <PHONE>")).as("m"))
      .collect().head.getString(0)
    assert(row.getString(3) === expected)
  }

  test("containment: substring doc contained in superset doc, not vice versa") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),                      // shingles: abc bcd cde
      (2L, "a b c d e f g h i j k l m n o"),  // superset of doc 1's
      (3L, "z y x w v u t")                   // unrelated
    ).toDF("doc_id", "text")
    val pairs = PipelineOps.containmentPairs(docs, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0))) // 1 fully inside 2; NOT 2 in 1
    val loose = PipelineOps.containmentPairs(docs, 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 2L), (2L, 1L))) // 2's containment in 1 = 3/13
  }

  test("containment: prefix-filtered path == exact all-pairs on sf0.001") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    for (t <- Seq(0.8, 0.5, 0.3)) {
      val fast = PipelineOps.containmentPairsPrefix(docs, t)
      val slow = PipelineOps.containmentPairsExact(docs, t)
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"prefix vs exact diverged at threshold $t")
    }
  }

  test("decontaminate: eval overlap scored, eval docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "q w e r t y u"),          // EVAL
      (2L, "q w e r t y u i o p"),    // train, shares 5 of 8 shingles
      (3L, "m n b v c x z")           // train, disjoint
    ).toDF("doc_id", "text")
    val rows = PipelineOps.decontaminate(docs, col("doc_id") === 1, maxFrac = 0.5)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(!rows.contains(1L))
    assert(rows(2L) == ((8L, 5L, true)))  // 5/8 = 0.625 >= 0.5
    assert(rows(3L) == ((5L, 0L, false)))
  }

  test("stratifiedSample: exact N per group, deterministic, small groups kept whole") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val s1 = PipelineOps.stratifiedSample(docs, "lang", 5).collect()
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang.values.forall(_ <= 5) && byLang.values.exists(_ == 5))
    // deterministic across invocations
    val s2 = PipelineOps.stratifiedSample(docs, "lang", 5).collect()
    assert(s1.map(_.getLong(0)).sorted.toSeq == s2.map(_.getLong(0)).sorted.toSeq)
    // a group smaller than N survives whole (prefilter bound railed at max)
    import spark.implicits._
    val tiny = Seq((1L, "aa bb", "xx"), (2L, "cc dd", "xx"))
      .toDF("doc_id", "text", "lang")
    assert(PipelineOps.stratifiedSample(tiny, "lang", 5).count() === 2)
  }

  test("streaming dedup-on-ingest == batch distinct fingerprints") {
    val dir = "/root/testdata/sf0.001"
    Tables.prepare(spark)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val deduped = stream
      .select(graft.ext.TextOps.fingerprint(col("text")).as("fp"))
      .dropDuplicates("fp")
    val got = graft.streaming.StreamingOps.runToParquet(deduped, "spec_dedup")
    val want = Tables.load(spark, dir, "documents")
      .select(graft.ext.TextOps.fingerprint(col("text")).as("fp")).distinct()
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("decontaminateBloom: no false negatives, bounded overshoot, deterministic") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val exact = PipelineOps.decontaminate(docs, col("doc_id") < 25, 0.3)
      .select(col("doc_id"), col("n_sh"), col("shared_sh"))
    val bloom = PipelineOps.decontaminateBloom(docs, col("doc_id") < 25, 0.3)
      .select(col("doc_id"), col("n_sh").as("n_sh_b"), col("bloom_hits"))
    val j = exact.join(bloom, "doc_id").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      // same per-row shingle universe, and Bloom can only overshoot
      assert(r.getAs[Long]("n_sh") === r.getAs[Long]("n_sh_b"))
      assert(r.getAs[Long]("bloom_hits") >= r.getAs[Long]("shared_sh"))
    }
    val extra = j.map(r => r.getAs[Long]("bloom_hits") - r.getAs[Long]("shared_sh")).sum
    val neg = j.map(r => r.getAs[Long]("n_sh") - r.getAs[Long]("shared_sh")).sum
    assert(extra <= math.ceil(0.03 * neg).toLong + 32, s"fp overshoot $extra vs $neg negatives")
    // bit placement is seed-fixed and OR-merged: a rebuild counts identically
    val again = PipelineOps.decontaminateBloom(docs, col("doc_id") < 25, 0.3)
      .select(col("doc_id"), col("bloom_hits"))
    assert(bloom.select(col("doc_id"), col("bloom_hits"))
      .exceptAll(again).isEmpty)
  }
}
