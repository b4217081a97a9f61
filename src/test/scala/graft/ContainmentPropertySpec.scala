package graft

import graft.ext.PipelineOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the prefix filter's recall-1 claim: over random
  * corpora drawn from a SMALL vocabulary (so shingles are heavily shared
  * and candidate pruning is actually stressed — including docs built by
  * splicing other docs' text, the containment-heavy case) and random
  * thresholds, the prefix-filtered path returns EXACTLY the all-pairs
  * exact result. Runs over fixed deterministic seeds (Spark actions are
  * too expensive for hundreds of scalacheck trials). */
class ContainmentPropertySpec extends AnyFunSuite with SparkSpec {

  private val vocab = Vector(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private val corpusGen: Gen[List[String]] = for {
    nBase <- Gen.choose(6, 12)
    base <- Gen.listOfN(nBase, for {
      len <- Gen.choose(3, 18)
      ws <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield ws.mkString(" "))
    // splice docs: substrings and concatenations of base docs — these
    // manufacture true containment relationships at assorted ratios
    spliced <- Gen.listOfN(6, for {
      i <- Gen.choose(0, nBase - 1)
      j <- Gen.choose(0, nBase - 1)
      cut <- Gen.choose(1, 10)
    } yield {
      val a = base(i).split(" ")
      val frag = a.take(math.max(3, math.min(cut, a.length))).mkString(" ")
      if (j % 2 == 0) frag else s"$frag ${base(j)}"
    })
  } yield base ++ spliced

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("prefix-filtered containment == exact all-pairs over random spliced corpora") {
    import spark.implicits._
    for (seed <- Seq(11L, 23L, 47L, 83L)) {
      val texts = sample(corpusGen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.35, 0.6, 0.85)) {
        val fast = PipelineOps.containmentPairsPrefix(docs, t)
        val slow = PipelineOps.containmentPairsExact(docs, t)
        val missing = slow.exceptAll(fast).count()
        val extra = fast.exceptAll(slow).count()
        assert(missing == 0 && extra == 0,
          s"seed=$seed threshold=$t missing=$missing extra=$extra")
      }
    }
  }
}
