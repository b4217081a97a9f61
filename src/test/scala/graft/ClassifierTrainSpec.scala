package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The trained hashed classifier must be a REAL model, not a relabeled
  * strawman: fit on the even-doc_id half, it has to beat the md5
  * pseudo-weight classifier at predicting the hygiene label on the
  * HELD-OUT odd half, by a wide margin.
  */
class ClassifierTrainSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("trained classifier beats the hash-weight strawman on held-out docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val label = docs.select(
      col("doc_id"), TextOps.classifierLabel(col("text")).as("y"))
    def accuracyOf(scored: org.apache.spark.sql.DataFrame): Double = {
      val joined = scored.join(label, "doc_id")
        .where(col("doc_id") % 2 === 1) // held-out half
      val agg = joined.agg(
        sum(when(col("keep") === col("y"), 1L).otherwise(0L)).as("ok"),
        count(lit(1)).as("n")).first()
      agg.getLong(0).toDouble / agg.getLong(1)
    }
    val trainedAcc = accuracyOf(TextOps.trainedClassifier(docs))
    val hashAcc = accuracyOf(TextOps.hashClassifier(docs))
    assert(trainedAcc > hashAcc + 0.1,
      s"trained=$trainedAcc must beat hash=$hashAcc by > 0.1")
    // 24% of this corpus sits within a hair of the 5%-ratio label
    // boundary (measured), so ~0.83 is strong for a hashed linear model;
    // the floor guards against calibration regressions, not Bayes-error
    assert(trainedAcc > 0.78, s"trained accuracy $trainedAcc not a real model")
  }

  test("trained classifier held-out precision/recall on the stopword-prose label") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val label = docs.select(
      col("doc_id"), TextOps.classifierLabel(col("text")).as("y"))
    def pr(scored: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val j = scored.join(label, "doc_id").where(col("doc_id") % 2 === 1)
      val a = j.agg(
        sum(when(col("keep") && col("y"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("keep") && !col("y"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("keep") && col("y"), 1L).otherwise(0L)).as("fn")).first()
      val (tp, fp, fn) = (a.getLong(0).toDouble, a.getLong(1), a.getLong(2))
      (tp / (tp + fp), tp / (tp + fn))
    }
    val (p, r) = pr(TextOps.trainedClassifier(docs))
    val (ph, rh) = pr(TextOps.hashClassifier(docs))
    info(f"trained held-out precision=$p%.3f recall=$r%.3f; " +
      f"hashed strawman precision=$ph%.3f recall=$rh%.3f")
    // the trained model must be a usable keep-filter on unseen docs, not
    // accuracy hiding a degenerate all-keep/all-drop policy. Precision is
    // the quality bar (what survives the filter is mostly really prose);
    // recall sits near 1/3 BY CONSTRUCTION of this corpus — the
    // keep-rate-matching quantile threshold splits the ~24% of docs
    // within a hair of the 5%-stopword label boundary roughly in half
    // (measured 0.33-0.34 at both sf0.001 and sf0.01) — so its floor
    // guards against collapse (all-drop => recall 0), not against the
    // boundary mass. The strawman comparison is the real claim: trained
    // F1 must strictly dominate.
    assert(p > 0.7 && r > 0.25, f"held-out precision=$p%.3f recall=$r%.3f")
    val f1 = 2 * p * r / (p + r)
    val f1h = if (ph + rh == 0) 0.0 else 2 * ph * rh / (ph + rh)
    assert(f1 > f1h, f"trained F1 $f1%.3f must beat hashed F1 $f1h%.3f")
  }

  test("trained scoring kernel replays the weight-array sum exactly") {
    import spark.implicits._
    // tiny corpus with known buckets: weights all = +3 micro-units makes
    // the score 3 * n_features, checking feature expansion + bucket sum
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "one"))
      .toDF("doc_id", "text")
    val w = Array.fill(16)(3L)
    val rows = docs.select(col("doc_id"),
        graft.functions.TextKernels
          .classifierTrainedCol(spark, col("text"), w).as("cs"))
      .select(col("doc_id"), col("cs.n_features").as("nf"),
        col("cs.score_micros").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L) === ((5L, 15L))) // 3 unigrams + 2 bigrams
    assert(rows(2L) === ((0L, 0L)))
    assert(rows(3L) === ((1L, 3L)))
  }
}
