package graft

import graft.ext.{HierIvf, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level IVF: kernel assignment matches a Scala reimplementation of
  * the two-stage argmin, the sub level genuinely refines the top level,
  * and the probed search recovers exact top-5 with useful recall. */
class HierIvfSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("assignCells == two-stage brute force; sub level refines top level") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val m = HierIvf.train(emb, k1 = 5, k2 = 4)
    assert(m.topFlat.length === 5 * m.dim && m.subFlat.length === 20 * m.dim)
    val got = HierIvf.assignCells(emb, m).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(c => c >= 0 && c < 20))
    assert(got.values.toSet.size > 5, "assignment must use the sub level")

    def d2(x: Array[Double], flat: Array[Double], c: Int): Double = {
      var d = 0.0; var j = 0
      while (j < m.dim) { val t = x(j) - flat(c * m.dim + j); d += t * t; j += 1 }
      d
    }
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    var topErr = 0.0; var subErr = 0.0
    vecs.foreach { case (id, x) =>
      val c1 = (0 until m.k1).minBy(c => d2(x, m.topFlat, c))
      val c2 = (0 until m.k2).minBy(c2 => d2(x, m.subFlat, c1 * m.k2 + c2))
      assert(got(id) === c1 * m.k2 + c2, s"vec $id: kernel vs brute force")
      topErr += d2(x, m.topFlat, c1)
      subErr += d2(x, m.subFlat, c1 * m.k2 + c2)
    }
    assert(subErr < topErr,
      f"resident-trained subs must refine: sub=$subErr%.1f top=$topErr%.1f")
    info(f"mean quantization error: top-only=${topErr / vecs.length}%.3f " +
      f"two-level=${subErr / vecs.length}%.3f")
  }

  test("probed search recovers exact top-5 with useful recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val (k1, k2) = HierIvf.scaledKs(emb.count())
    val m = HierIvf.train(emb, k1, k2)
    val exact = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = HierIvf.nn(emb, m, k = 5, probeFilter = col("vec_id") < 10,
        nprobeTop = 2, nprobeSub = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    info(f"recall@5 = $mean%.2f (k1=$k1 k2=$k2)")
    assert(mean >= 0.2, s"mean recall@5 = $mean")
  }
}
