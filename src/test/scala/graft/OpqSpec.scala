package graft

import graft.ext.{Opq, ProductQuantize, Similarity}
import graft.functions.VectorExpressions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ (parametric): the learned rotation is orthogonal (preserves norms
  * and dot products — the property that keeps exact re-ranking on original
  * vectors valid), the matvec kernel matches a Scala reimplementation, the
  * eigensolver satisfies the eigen property, and rotated-space PQ does not
  * lose quantization quality vs plain PQ. */
class OpqSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("jacobi eigensolver: A v = lambda v and orthonormal vectors") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.2),
      Array(0.5, 0.2, 2.0))
    val (values, vectors) = Opq.jacobiEigen(a)
    for (i <- 0 until 3) {
      val v = vectors(i)
      val av = Array.tabulate(3)(r => (0 until 3).map(c => a(r)(c) * v(c)).sum)
      for (r <- 0 until 3)
        assert(math.abs(av(r) - values(i) * v(r)) < 1e-8, s"eigenpair $i row $r")
      for (j <- 0 until 3) {
        val d = (0 until 3).map(c => vectors(i)(c) * vectors(j)(c)).sum
        assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"orthonormal $i,$j")
      }
    }
  }

  test("learned rotation is orthogonal and balanced-bucketing is a permutation") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val opq = Opq.train(emb, m = 8, k = 16, sampleN = 256)
    val d = opq.dim
    val r = opq.rotation
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(c => r(i * d + c) * r(j * d + c)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"RR' at $i,$j")
    }
    val buckets = Opq.balancedBuckets(Array.tabulate(64)(i => 64.0 - i), 8)
    assert(buckets.flatten.sorted.toSeq === (0 until 64))
    assert(buckets.forall(_.length === 8))
  }

  test("matvec kernel: codegen == interpreted == Scala; rotation preserves geometry") {
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").limit(64)
    val opq = Opq.train(emb, sampleN = 256)
    val d = opq.dim
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val v = col("embedding").cast("array<double>")
    // codegen path (whole-stage over the DataFrame)
    val got = emb.select(col("vec_id"), Opq.rotate(opq, v).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    rows.foreach { case (id, x) =>
      val expect = Array.tabulate(d)(i =>
        (0 until d).map(j => opq.rotation(i * d + j) * x(j)).sum)
      val rx = got(id)
      // interpreted path (direct eval on literals)
      val interp = {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        graft.functions.MatVec(
          Literal.create(ArrayData.toArrayData(opq.rotation), ArrayType(DoubleType)),
          Literal.create(ArrayData.toArrayData(x), ArrayType(DoubleType)), d)
          .eval(null).asInstanceOf[ArrayData].toDoubleArray()
      }
      for (i <- 0 until d) {
        assert(math.abs(rx(i) - expect(i)) < 1e-10, s"matvec codegen id=$id dim=$i")
        assert(rx(i) === interp(i), s"codegen != interpreted id=$id dim=$i")
      }
      // orthogonality in action: |Rx| == |x|
      val n1 = math.sqrt(x.map(t => t * t).sum)
      val n2 = math.sqrt(rx.map(t => t * t).sum)
      assert(math.abs(n1 - n2) < 1e-8, s"norm preserved id=$id")
    }
  }

  test("rotated-space PQ quantization error <= plain PQ (balanced subspaces)") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val sample = emb.select(col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(256).collect().map(_.getSeq[Double](0).toArray)
    val pq = ProductQuantize.trainOnSample(sample, 8, 16)
    val opq = Opq.train(emb, m = 8, k = 16, sampleN = 256)
    val d = sample.head.length

    def decode(pqm: ProductQuantize.PQ, x: Array[Double]): Array[Double] = {
      val out = new Array[Double](d)
      for (s <- 0 until pqm.m) {
        var best = 0; var bestD = Double.MaxValue
        for (cid <- 0 until pqm.k) {
          var dist = 0.0
          val base = (s * pqm.k + cid) * pqm.dsub
          for (j <- 0 until pqm.dsub) {
            val t = x(s * pqm.dsub + j) - pqm.flat(base + j)
            dist += t * t
          }
          if (dist < bestD) { bestD = dist; best = cid }
        }
        val base = (s * pqm.k + best) * pqm.dsub
        for (j <- 0 until pqm.dsub) out(s * pqm.dsub + j) = pqm.flat(base + j)
      }
      out
    }
    def err(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
    val plainErr = sample.map(x => err(x, decode(pq, x))).sum / sample.length
    val rotated = sample.map { x =>
      Array.tabulate(d)(i => (0 until d).map(j => opq.rotation(i * d + j) * x(j)).sum)
    }
    val opqErr = rotated.map(x => err(x, decode(opq.pq, x))).sum / sample.length
    // R is orthogonal, so errors live in the same metric; parametric OPQ
    // should not LOSE quality (small tolerance for Lloyd's local optima)
    assert(opqErr <= plainErr * 1.05, s"opq=$opqErr plain=$plainErr")
    info(f"quantization error: plain=$plainErr%.4f opq=$opqErr%.4f (${100 * (1 - opqErr / plainErr)}%.1f%% lower)")
  }

  test("refined (alternating) OPQ: error <= parametric, rotation stays orthogonal") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val parametric = Opq.train(emb, m = 8, k = 16, sampleN = 256)
    val refined = Opq.trainRefined(emb, m = 8, k = 16, sampleN = 256, iters = 4)
    val d = refined.dim
    // orthogonality of the refined rotation (Procrustes solution is R = VU')
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(c => refined.rotation(i * d + c) * refined.rotation(j * d + c)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-7, s"RR' at $i,$j")
    }
    // refinement keeps the best iterate: never worse than the init
    val sample = emb.select(col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(256).collect().map(_.getSeq[Double](0).toArray)
    def err(opq: Opq.OPQ): Double = {
      sample.map { x =>
        val y = Array.tabulate(d)(i => (0 until d).map(j => opq.rotation(i * d + j) * x(j)).sum)
        // decode via nearest codebook entries
        val pq = opq.pq
        val yh = new Array[Double](d)
        for (s <- 0 until pq.m) {
          var best = 0; var bestD = Double.MaxValue
          for (cid <- 0 until pq.k) {
            var dd = 0.0
            val base = (s * pq.k + cid) * pq.dsub
            for (j <- 0 until pq.dsub) {
              val t = y(s * pq.dsub + j) - pq.flat(base + j); dd += t * t
            }
            if (dd < bestD) { bestD = dd; best = cid }
          }
          val base = (s * pq.k + best) * pq.dsub
          for (j <- 0 until pq.dsub) yh(s * pq.dsub + j) = pq.flat(base + j)
        }
        y.zip(yh).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum / sample.length
    }
    val pe = err(parametric); val re = err(refined)
    assert(re <= pe + 1e-9, s"refined=$re parametric=$pe")
    info(f"quantization error: parametric=$pe%.4f refined=$re%.4f (${100 * (1 - re / pe)}%.1f%% lower)")
  }

  test("opq rerank recovers exact top-5 with useful recall") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val opq = Opq.train(emb, sampleN = 2048)
    val exactRows = Similarity.cosineTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = exactRows.groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val got = Opq.rerankTopK(emb, opq, col("vec_id") < 10, k = 5, rerank = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val recalls = exact.map { case (q, ids) => (got.getOrElse(q, Set.empty) & ids).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"mean recall@5 = $mean")
  }
}
