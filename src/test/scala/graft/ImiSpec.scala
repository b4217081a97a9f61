package graft

import graft.ext.{Imi, Similarity}
import graft.functions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted multi-index: the cell kernel matches a Scala reimplementation,
  * multi-probe cells(0) equals the assignment cell, and grid-probed search
  * keeps useful recall against brute force. */
class ImiSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("imi cell kernel matches a Scala reimplementation; cells(0) == cell") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(64)
    val model = Imi.train(emb, k = 8, sampleN = 128)
    val cbLit = typedlit(model.flat.toSeq)
    val rows = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("cell", VectorExpressions.imiCell(spark, col("v"), cbLit, model.k, model.dsub))
      .withColumn("cells", VectorExpressions.imiCells(spark, col("v"), cbLit, model.k, model.dsub, 3))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getSeq[Double](1).toArray
      val cell = r.getInt(2)
      val cells = r.getSeq[Int](3)
      // scala reimplementation
      val expected = (0 until 2).map { h =>
        (0 until model.k).minBy { cid =>
          (0 until model.dsub).map { j =>
            val t = x(h * model.dsub + j) - model.flat((h * model.k + cid) * model.dsub + j)
            t * t
          }.sum
        }
      }
      assert(cell === expected(0) * model.k + expected(1), s"vec ${r.getLong(0)}")
      assert(cells.length === 9)
      assert(cells.head === cell, "multi-probe first cell must be the assignment cell")
      assert(cells.distinct.length === 9, "crossed cells must be distinct")
    }
  }

  test("imi grid search recovers exact top-5 with useful recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val model = Imi.train(emb, k = Imi.scaledK(emb.count()))
    val exact = Similarity.cosineTopK(emb, lit(true), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = Imi.nn(emb, model, perHalf = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) =>
      (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@5 = $mean")
    info(f"imi recall@5 = $mean%.2f over ${exact.size} probes, k=${model.k} (${model.k * model.k} cells)")
  }
}
