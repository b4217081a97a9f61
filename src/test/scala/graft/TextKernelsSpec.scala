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
}
