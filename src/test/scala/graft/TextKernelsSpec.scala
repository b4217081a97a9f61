package graft

import graft.ext.TextOps
import graft.functions.TextKernels
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd shingle kernel must reproduce the declarative
  * lower+regexp_extract_all+window-lead formulation exactly — it replaces a
  * shuffle, not a semantic. */
class TextKernelsSpec extends AnyFunSuite with SparkSpec {

  /** The pre-kernel shingle pipeline (posexplode + per-doc window lead),
    * kept as the executable reference. */
  private def windowShingles(docs: org.apache.spark.sql.DataFrame, n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs
      .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val parts = col("tok") +: (1 until n).map(k => lead(col("tok"), k).over(w))
    tok
      .select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"),
        lead(col("tok"), n - 1).over(w).isNotNull.as("__full"))
      .where(col("__full"))
      .select("doc_id", "shingle")
  }

  test("kernel multiset == window formulation on all sf0.001 documents (n=3)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kernel = graft.ext.Dedup.docShinglesRaw(docs, 3)
      .groupBy("doc_id", "shingle").count()
    val ref = windowShingles(docs, 3)
      .groupBy("doc_id", "shingle").count()
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("distinct kernel == window formulation .distinct() (n=2)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val kernel = graft.ext.Dedup.docShingles(docs, 2)
    val ref = windowShingles(docs, 2).distinct()
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty)
  }

  test("edge cases: short docs, punctuation, case folding, SQL call") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two"),                 // < n tokens -> no shingles
      (2L, "A-b, C!  d"),              // punctuation splits, lowercased
      (3L, "x y x y x y"),             // repeats -> distinct collapses
      (4L, "")                         // empty
    ).toDF("doc_id", "text")
    val raw = graft.ext.Dedup.docShinglesRaw(docs, 3)
      .as[(Long, String)].collect().toSeq
    assert(raw.filter(_._1 == 1L).isEmpty)
    assert(raw.filter(_._1 == 2L).map(_._2) == Seq("a b c", "b c d"))
    assert(raw.filter(_._1 == 3L).map(_._2) ==
      Seq("x y x", "y x y", "x y x", "y x y"))
    assert(raw.filter(_._1 == 4L).isEmpty)
    val dis = graft.ext.Dedup.docShingles(docs, 3)
      .as[(Long, String)].collect().toSeq
    assert(dis.filter(_._1 == 3L).map(_._2).sorted == Seq("x y x", "y x y"))
    TextKernels.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_shingles_distinct('a b c d', 3) AS s").as[Seq[String]]
      .collect().head
    assert(viaSql == Seq("a b c", "b c d"))
  }

  test("kernel adds no exchange on a well-partitioned input; only the " +
      "spread round-robin on an under-partitioned one") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeExec] = p.collect {
      case e: ShuffleExchangeExec => Seq(e)
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
    }.flatten
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val wide = docs.repartition(spark.sparkContext.defaultParallelism)
    // pre-spread input (the 100 TB shape): zero exchanges beyond wide's own
    val plan = graft.ext.Dedup.docShingles(wide).queryExecution.executedPlan
    assert(exchanges(plan).size === 1,
      s"only wide's own repartition expected:\n$plan")
    // single-partition local file: exactly the one spread repartition, of
    // compact doc rows (round-robin), never of exploded tokens
    val narrow = graft.ext.Dedup.docShingles(docs.coalesce(1))
      .queryExecution.executedPlan
    val spreads = exchanges(narrow)
    assert(spreads.size === 1, s"one spread exchange expected:\n$narrow")
    assert(spreads.head.outputPartitioning.numPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("char n-gram kernel == substring formulation; code-point windows") {
    import spark.implicits._
    TextKernels.register(spark)
    // declarative reference: substring over 1..len-2
    val docs = Seq((1L, "Abc de"), (2L, "xy"), (3L, ""), (4L, "aaaa"))
      .toDF("doc_id", "text")
    val kernel = docs.select(col("doc_id"),
        TextKernels.charNgramArray(spark, col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(kernel(1L) == Seq("abc", "bc ", "c d", " de"))
    assert(kernel(2L).isEmpty && kernel(3L).isEmpty)
    assert(kernel(4L) == Seq("aaa", "aaa"))
    // non-BMP code points count as ONE position (DuckDB substring parity)
    val emoji = Seq((1L, "a😀b")).toDF("doc_id", "text")
      .select(TextKernels.charNgramArray(spark, col("text"), 3).as("g"))
      .as[Seq[String]].collect().head
    assert(emoji == Seq("a😀b"))
  }

  test("repetition-stats kernel: hand-checked fields and <3-token null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),        // 2-grams: "a b"x2,"b a"x2 -> tie, gram asc
      (2L, "x y x y x y"),      // 3-grams "x y x"x2,"y x y"x2 -> dup3
      (3L, "one two")           // < 3 tokens -> dropped
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionSignals(docs)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(3L))
    val d1 = r(1L)
    assert(d1.getAs[String]("top2_gram") == "a b")    // tie -> lexicographic
    assert(d1.getAs[Long]("top2_cnt") == 2L)
    assert(d1.getAs[Long]("alpha_chars") == 5L)
    assert(d1.getAs[Double]("top2_frac") == 2.0 * 2 / 5)
    val d2 = r(2L)
    // "x y x" and "y x y" each occur twice: dup3 = 2*3 + 2*3 = 12 chars
    assert(d2.getAs[Long]("dup3_chars") == 12L)
    assert(d2.getAs[Double]("dup3_frac") == 12.0 / 6)
  }

  test("trigram rare-rate: common set bounded, degenerate-uniform corpus " +
      "scores zero, injected gibberish scores high") {
    import spark.implicits._
    // uniform corpus: every trigram common -> rare_rate 0 for all docs
    val uni = (0L until 20L).map(i => (i, "the same line of text here"))
      .toDF("doc_id", "text")
    val ru = TextOps.trigramRareRate(uni, relDenom = 2000L)
    assert(ru.where(col("n_rare") > 0).isEmpty)
    // one gibberish doc among repeats: its trigrams are rare, others' not
    val mixed = ((0L until 40L).map(i => (i, "the same line of text here")) :+
      (99L, "qzv jxk wqp zzv")).toDF("doc_id", "text")
    val rm = TextOps.trigramRareRate(mixed, relDenom = 50L)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(rm(99L) > 0.8, s"gibberish doc should score high: ${rm(99L)}")
    assert(rm(0L) == 0.0)
  }
}
