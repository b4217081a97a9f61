package graft

import graft.ext.MixOps
import org.scalatest.funsuite.AnyFunSuite

/** Pins MixOps.epochAllocate (UniMax, Chung et al. 2023) to the greedy
  * reference loop: visit groups ascending by size, each takes
  * min(cap, remaining budget / remaining groups). The windowed closed
  * form must reproduce the loop exactly on skewed, uniform, and
  * all-capped corpora.
  */
class EpochAllocateSpec extends AnyFunSuite with SparkSpec {

  /** The paper's greedy loop with EXACT (rational) shares — the uniform
    * share b/k is kept as a fraction so it stays loop-invariant once a
    * group goes uncapped (b' / (k-1) = (b - b/k) / (k-1) = b/k), and
    * each reported allocation floors only at the end. This is the
    * semantics the operator's closed windowed form implements. */
  private def greedy(
      tokens: Seq[(String, Long)], maxEpochs: Long,
      budget: Long): Map[String, Long] = {
    var bNum = BigInt(budget) // remaining budget = bNum / bDen, exact
    var bDen = BigInt(1)
    var k = tokens.size.toLong
    val out = Map.newBuilder[String, Long]
    tokens.sortBy(t => (t._2, t._1)).foreach { case (g, n) =>
      val cap = BigInt(n * maxEpochs)
      if (cap * bDen * k <= bNum) { // cap <= (b / k)
        out += g -> cap.toLong
        bNum -= cap * bDen // b -= cap
      } else {
        out += g -> (bNum / (bDen * k)).toLong // floor(b / k)
        bNum *= (k - 1) // b -= b/k exactly
        bDen *= k
      }
      k -= 1
    }
    out.result()
  }

  private def run(
      docs: Seq[(Long, String, String)], maxEpochs: Long,
      num: Long, den: Long): (Map[String, Long], Map[String, Long]) = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "lang", "text")
    val got = MixOps.epochAllocate(df, "lang", maxEpochs, num, den)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val toks = docs.groupBy(_._2).map { case (g, rows) =>
      g -> rows.map(_._3.split("[^a-z0-9]+").count(_.nonEmpty).toLong).sum
    }.toSeq
    val total = toks.map(_._2).sum
    (got, greedy(toks, maxEpochs, total * num / den))
  }

  test("skewed corpus: small groups cap, the big one takes the remainder") {
    // a:2 tokens, b:4, c:16 — budget 1.5x total (33), maxEpochs 2:
    // a caps at 4, b caps at 8, c gets 33-12=21 < 32
    val docs = Seq(
      (1L, "a", "x y"),
      (2L, "b", "x y z w"),
      (3L, "c", "a b c d e f g h"),
      (4L, "c", "a b c d e f g h"))
    val (got, want) = run(docs, 2L, 3L, 2L)
    assert(got === want)
    assert(got("a") === 4L && got("b") === 8L && got("c") === 21L)
  }

  test("uniform corpus: nobody caps, budget splits evenly") {
    val docs = (0 until 4).map(i =>
      (i.toLong, s"g$i", "one two three four"))
    // budget = total (16), caps = 8 each; share = 4 < 8 -> all uncapped
    val (got, want) = run(docs, 2L, 1L, 1L)
    assert(got === want)
    assert(got.values.toSet === Set(4L))
  }

  test("oversized budget: everything caps at maxEpochs") {
    val docs = Seq((1L, "a", "x y"), (2L, "b", "x y z w e r t y"))
    // budget = 4x total >> caps
    val (got, want) = run(docs, 2L, 4L, 1L)
    assert(got === want)
    assert(got("a") === 4L && got("b") === 16L)
  }

  test("corpus-sized work is one scan: a single parquet read in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = MixOps.epochAllocate(docs, "lang", 2L, 3L, 2L)
      .queryExecution.executedPlan.toString()
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected 1 corpus scan, got $scans:\n$plan")
    assert(!plan.contains("CollectLimit"), "allocation must not collect")
  }

  test("corpus recipe: appearances realize the allocation within one " +
      "doc of budget, extras are the quality prefix") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val recipe = MixOps.corpusRecipe(docs).collect()
    val alloc = MixOps.epochAllocate(docs)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    recipe.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      // delivered tokens: n_appearances-weighted token sum must cover the
      // allocation minus at most one document (the cumsum boundary) and
      // never exceed it plus the boundary document
      val delivered = rows.map(r => r.getLong(2) * r.getLong(6)).sum
      val a = alloc(lang)
      val maxDoc = rows.map(_.getLong(2)).max
      assert(delivered <= a, s"$lang over-delivered: $delivered > $a")
      assert(delivered >= a - maxDoc,
        s"$lang under-delivered: $delivered < $a - $maxDoc")
      // extras are exactly a prefix of the (score desc, doc_id) order
      val sorted = rows.sortBy(r => (-r.getLong(3), r.getLong(0)))
      val extras = sorted.map(_.getBoolean(5))
      assert(!extras.dropWhile(identity).contains(true),
        s"$lang extras are not a quality prefix")
    }
  }

  test("real documents: engine equals the greedy loop per language") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = MixOps.epochAllocate(docs, "lang", 2L, 3L, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    import org.apache.spark.sql.functions._
    val toks = docs
      .groupBy("lang")
      .agg(sum(size(graft.ext.TextOps.tokens(col("text"))).cast("long"))
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = greedy(toks, 2L, toks.map(_._2).sum * 3L / 2L)
    assert(out === want)
  }
}
