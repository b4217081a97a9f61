package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Precompiled hot loops for the vector expressions below, over PRIMITIVE
  * arrays. Two JIT failure modes motivated moving every per-element loop
  * out of generated code and off ArrayData accessors:
  *
  *  1. Inlined loops bloat the whole-stage method toward HotSpot's
  *     huge-method bytecode limit, risking interpreter fallback for the
  *     entire stage.
  *  2. The decisive one, confirmed by measurement: per-element
  *     `ArrayData.getDouble` call sites go MEGAMORPHIC once a large
  *     query suite has exercised every ArrayData subclass (unsafe,
  *     generic, columnar) in one JVM — the JIT then emits virtual
  *     dispatch inside the hot loop. Isolated runs stay bimorphic and
  *     look fine; under the full 84-query bench the same SRP query
  *     measured 54.9 s vs 8.4 s after this change (and a raw-loop
  *     microbenchmark of identical code ran 2.75 GFLOP/s single-thread
  *     while the in-suite kernel managed ~0.5 aggregate).
  *
  * The pattern: ONE virtual `toDoubleArray()` per row (a bulk copy), then
  * branch-free primitive-array loops in a small static that JIT-compiles
  * once. Interpreted eval delegates to the same statics — one source of
  * truth, bit-identical accumulation order on both paths. */
object VectorKernels {

  /** Sequential left-to-right dot. Converts each side ONCE (one virtual
    * call per row) and folds over primitive arrays: per-ELEMENT ArrayData
    * accessors become megamorphic once a large query suite has exercised
    * every ArrayData subclass, and the JIT then emits virtual dispatch
    * inside the hot loop (~10x, and only reproducible under a full bench
    * run — isolated queries stay bimorphic and look fine).
    *
    * Null-bearing arrays are NOT supported: `toDoubleArray` never throws
    * for null elements (GenericArrayData unboxes them to 0.0;
    * UnsafeArrayData raw-copies zeroed slots), so a null element
    * contributes 0.0 to the product — it does NOT skip the pair. None of
    * the vector pipelines in this library produce null elements (embedding
    * columns are non-null by schema; derived arrays come from kernels that
    * never emit null), and no skip-pair fallback exists to pretend
    * otherwise. */
  def dot(a: ArrayData, b: ArrayData): Double =
    dotArr(a.toDoubleArray(), b.toDoubleArray())

  def dotArr(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i) * y(i); i += 1 }
    acc
  }

  def sq8Encode(x: Array[Double], lo: Array[Double], st: Array[Double]): Array[Byte] = {
    val n = x.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = st(i)
      val c = if (s == 0.0) 0L else Math.round((x(i) - lo(i)) / s)
      out(i) = Math.max(0L, Math.min(255L, c)).toByte
      i += 1
    }
    out
  }

  def sq8Dot(q: Array[Double], cd: Array[Byte], lo: Array[Double],
      st: Array[Double]): Double = {
    val n = Math.min(q.length, cd.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += q(i) * (lo(i) + st(i) * (cd(i) & 0xff))
      i += 1
    }
    acc
  }

  def pqEncode(x: Array[Double], c: Array[Double], m: Int, k: Int,
      dsub: Int): Array[Byte] = {
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var cid = 0
      while (cid < k) {
        var d = 0.0; var j = 0
        val base = (s * k + cid) * dsub
        while (j < dsub) {
          val t = x(s * dsub + j) - c(base + j)
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = cid }
        cid += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  def pqAdcDot(q: Array[Double], cd: Array[Byte], cb: Array[Double],
      k: Int, dsub: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < cd.length) {
      val base = (s * k + (cd(s) & 0xff)) * dsub
      var j = 0
      while (j < dsub) {
        acc += q(s * dsub + j) * cb(base + j)
        j += 1
      }
      s += 1
    }
    acc
  }

  def pqNormSq(cd: Array[Byte], tab: Array[Double], k: Int): Double = {
    var acc = 0.0
    var s = 0
    while (s < cd.length) { acc += tab(s * k + (cd(s) & 0xff)); s += 1 }
    acc
  }

  def ivfCell(x: Array[Double], c: Array[Double], k: Int): Int = {
    val dim = x.length
    var best = 0; var bestD = Double.MaxValue
    var cid = 0
    while (cid < k) {
      var d = 0.0; var j = 0
      val base = cid * dim
      while (j < dim) {
        val t = x(j) - c(base + j)
        d += t * t; j += 1
      }
      if (d < bestD) { bestD = d; best = cid }
      cid += 1
    }
    best
  }

  def ivfCells(x: Array[Double], c: Array[Double], k: Int,
      nprobe: Int): ArrayData = {
    val dim = x.length
    val dists = new Array[Double](k)
    var cid = 0
    while (cid < k) {
      var d = 0.0; var j = 0
      val base = cid * dim
      while (j < dim) {
        val t = x(j) - c(base + j)
        d += t * t; j += 1
      }
      dists(cid) = d
      cid += 1
    }
    val out = new Array[Int](nprobe)
    var p = 0
    while (p < nprobe) {
      var best = -1; var bestD = Double.MaxValue
      var i = 0
      while (i < k) {
        if (dists(i) < bestD) { bestD = dists(i); best = i }
        i += 1
      }
      out(p) = best
      dists(best) = Double.PositiveInfinity
      p += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def pqDecode(codes: Array[Byte], c: Array[Double], k: Int,
      dsub: Int): ArrayData = {
    val m = codes.length
    val out = new Array[Double](m * dsub)
    var s = 0
    while (s < m) {
      val base = (s * k + (codes(s) & 0xff)) * dsub
      var j = 0
      while (j < dsub) { out(s * dsub + j) = c(base + j); j += 1 }
      s += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  def imiCell(x: Array[Double], c: Array[Double], k: Int, dsub: Int): Int = {
    var cell = 0
    var h = 0
    while (h < 2) {
      var best = 0; var bestD = Double.MaxValue
      var cid = 0
      while (cid < k) {
        var d = 0.0; var j = 0
        val cbase = (h * k + cid) * dsub
        val vbase = h * dsub
        while (j < dsub) {
          val t = x(vbase + j) - c(cbase + j)
          d += t * t; j += 1
        }
        if (d < bestD) { bestD = d; best = cid }
        cid += 1
      }
      cell = cell * k + best
      h += 1
    }
    cell
  }

  def imiCells(x: Array[Double], c: Array[Double], k: Int, dsub: Int,
      perHalf: Int): ArrayData = {
    val top = Array.ofDim[Int](2, perHalf)
    var h = 0
    while (h < 2) {
      val dists = new Array[Double](k)
      var cid = 0
      while (cid < k) {
        var d = 0.0; var j = 0
        val cbase = (h * k + cid) * dsub
        val vbase = h * dsub
        while (j < dsub) {
          val t = x(vbase + j) - c(cbase + j)
          d += t * t; j += 1
        }
        dists(cid) = d; cid += 1
      }
      var p = 0
      while (p < perHalf) {
        var best = -1; var bestD = Double.MaxValue
        var i = 0
        while (i < k) {
          if (dists(i) < bestD) { bestD = dists(i); best = i }
          i += 1
        }
        top(h)(p) = best
        dists(best) = Double.PositiveInfinity
        p += 1
      }
      h += 1
    }
    val out = new Array[Int](perHalf * perHalf)
    var a = 0
    while (a < perHalf) {
      var b = 0
      while (b < perHalf) {
        out(a * perHalf + b) = top(0)(a) * k + top(1)(b)
        b += 1
      }
      a += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** rows×d constant-matrix × vector product over primitive arrays. */
  def matVec(m: Array[Double], x: Array[Double], rows: Int): ArrayData = {
    val d = x.length
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      var s = 0.0; var j = 0
      val base = i * d
      while (j < d) { s += m(base + j) * x(j); j += 1 }
      out(i) = s
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Pack ALL projection signs into a little-endian long-array bitset
    * (bit i of word i/64 set iff proj_i > 0) — the compact signature the
    * SRP hamming prefilter ships per candidate instead of the full
    * vector (24 longs vs 128 doubles + norm at h=1515). */
  def packSigns(p0: ArrayData): ArrayData = {
    val p = p0.toDoubleArray()
    val out = new Array[Long]((p.length + 63) >>> 6)
    var i = 0
    while (i < p.length) {
      if (p(i) > 0d) out(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Hamming distance between two packed sign bitsets. */
  def hamming(a0: ArrayData, b0: ArrayData): Int = {
    val a = a0.toLongArray()
    val b = b0.toLongArray()
    val n = math.min(a.length, b.length)
    var i = 0; var h = 0
    while (i < n) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  }

  /** Pack `bands` groups of `bits` projection signs into int bucket ids. */
  def signBands(p0: ArrayData, bits: Int, bands: Int): ArrayData = {
    val p = p0.toDoubleArray()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var v = 0; var i = 0
      val base = b * bits
      while (i < bits) {
        if (p(base + i) > 0d) v |= 1 << i
        i += 1
      }
      out(b) = v
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Native dot product over two array<double> columns.
  *
  * The composable alternative — aggregate(zip_with(a, b, _*_), 0.0, _+_) —
  * runs the lambda interpreter per element and allocates an intermediate
  * array; this expression is a tight codegen'd loop over the unsafe array
  * data. The accumulation order is the same sequential left-to-right fold,
  * so results are bit-identical to the HOF form (and to the DuckDB oracle).
  *
  * Null array elements are treated as 0 (embeddings carry none).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers must pass array<double> (cast first); Spark 4 hides the
  // ExpectsInputTypes/AbstractDataType machinery from external packages
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 8-bit scalar quantization encoder: array<double> vector -> BinaryType
  * codes, code_d = round((x_d - lo_d) / step_d) clamped to [0, 255].
  * lo/step are per-dimension literal arrays (trained driver-side on a
  * sample — see [[graft.ext.Quantize]]). 8x smaller corpus vectors are the
  * point: at 100 TB the NN corpus becomes memory-resident 64 B/vector
  * instead of 512 B. */
case class SQ8Encode(vec: Expression, lo: Expression, step: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = lo
  override def third: Expression = step
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_sq8_encode"

  override def nullSafeEval(v: Any, l: Any, s: Any): Any =
    VectorKernels.sq8Encode(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      l.asInstanceOf[ArrayData].toDoubleArray(),
      s.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, s) =>
      s"""${ev.value} = graft.functions.VectorKernels.sq8Encode(
         |  $v.toDoubleArray(), $l.toDoubleArray(), $s.toDoubleArray());""".stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(vec = f, lo = s, step = t)
}

/** Asymmetric quantized dot product: full-precision query vector against
  * SQ8 codes, dot = sum_d q_d * (lo_d + step_d * code_d). One codegen'd
  * loop over the byte array — the first-pass scorer for quantized NN;
  * exact re-ranking then touches only the surviving candidates. */
case class SQ8Dot(query: Expression, codes: Expression, lo: Expression, step: Expression)
    extends QuaternaryExpression {

  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = lo
  override def fourth: Expression = step
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sq8_dot"

  override def nullSafeEval(q: Any, c: Any, l: Any, s: Any): Any =
    VectorKernels.sq8Dot(
      q.asInstanceOf[ArrayData].toDoubleArray(),
      c.asInstanceOf[Array[Byte]],
      l.asInstanceOf[ArrayData].toDoubleArray(),
      s.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, l, s) =>
      s"""${ev.value} = graft.functions.VectorKernels.sq8Dot(
         |  $q.toDoubleArray(), $c, $l.toDoubleArray(), $s.toDoubleArray());""".stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(query = f, codes = s, lo = t, step = q)
}

/** Product-quantization encoder: split the vector into `m` contiguous
  * subspaces of `dsub` dims; per subspace emit the id (one byte) of the
  * nearest codebook centroid. `codebook` is a flattened literal
  * array<double> laid out [sub][centroid][dim] (trained driver-side on a
  * sample — [[graft.ext.ProductQuantize]]). m bytes per vector: 64x
  * smaller than the double vector at m=8. */
case class PQEncode(vec: Expression, codebook: Expression, m: Int, k: Int, dsub: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any =
    VectorKernels.pqEncode(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      cb.asInstanceOf[ArrayData].toDoubleArray(), m, k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"""${ev.value} = graft.functions.VectorKernels.pqEncode(
         |  $v.toDoubleArray(), $cb.toDoubleArray(), $m, $k, $dsub);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

/** PQ asymmetric-distance dot: full-precision query against PQ codes,
  * dot = sum over subspaces of q_sub . centroid[sub][code_sub]. The
  * classic ADC formulation with the table lookups fused into one loop. */
case class PQAdcDot(query: Expression, codes: Expression, codebook: Expression, k: Int, dsub: Int)
    extends TernaryExpression {

  override def first: Expression = query
  override def second: Expression = codes
  override def third: Expression = codebook
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_dot"

  override def nullSafeEval(q: Any, c: Any, cb: Any): Any =
    VectorKernels.pqAdcDot(
      q.asInstanceOf[ArrayData].toDoubleArray(),
      c.asInstanceOf[Array[Byte]],
      cb.asInstanceOf[ArrayData].toDoubleArray(), k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, cb) =>
      s"""${ev.value} = graft.functions.VectorKernels.pqAdcDot(
         |  $q.toDoubleArray(), $c, $cb.toDoubleArray(), $k, $dsub);""".stripMargin)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(query = f, codes = s, codebook = t)
}

/** Squared norm of a PQ reconstruction: subspaces are disjoint coordinate
  * blocks, so ||recon||^2 = sum over subspaces of ||centroid[sub][code]||^2
  * — one lookup per subspace in a per-(sub, centroid) table. */
case class PQNormSq(codes: Expression, normSq: Expression, k: Int)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = normSq
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_normsq"

  override def nullSafeEval(c: Any, t: Any): Any =
    VectorKernels.pqNormSq(
      c.asInstanceOf[Array[Byte]],
      t.asInstanceOf[ArrayData].toDoubleArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) =>
      s"""${ev.value} = graft.functions.VectorKernels.pqNormSq(
         |  $c, $t.toDoubleArray(), $k);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, normSq = r)
}

/** IVF cell assignment: argmin over a FLAT [k][dim] centroid matrix of the
  * squared L2 distance — ONE generated loop per row regardless of k. The
  * previous formulation (k separate literal-dot-product expression columns
  * + array_min/array_position) bloats generated code linearly in k and
  * collapses past a few dozen cells (measured ~4x wall-clock at k=70 and
  * ~2.5x at k=223 vs this kernel); cell counts must scale ~sqrt(corpus),
  * so the kernel is what makes scaled-k IVF viable. Ties break to the
  * lower cell id (strict <). */
case class IvfCell(vec: Expression, centroids: Expression, k: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = centroids
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_ivf_cell"

  override def nullSafeEval(v: Any, cs: Any): Any =
    VectorKernels.ivfCell(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      cs.asInstanceOf[ArrayData].toDoubleArray(), k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) =>
      s"""${ev.value} = graft.functions.VectorKernels.ivfCell(
         |  $v.toDoubleArray(), $cs.toDoubleArray(), $k);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, centroids = r)
}

/** Multi-probe variant of [[IvfCell]]: the `nprobe` nearest cell ids
  * ascending by distance (selection over the k-length distance array —
  * nprobe is small, so nprobe passes of argmin beat a full sort). Same
  * distance formula and tie rule as IvfCell, so cells[0] == IvfCell. */
case class IvfCells(vec: Expression, centroids: Expression, k: Int, nprobe: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = centroids
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_cells"

  override def nullSafeEval(v: Any, cs: Any): Any =
    VectorKernels.ivfCells(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      cs.asInstanceOf[ArrayData].toDoubleArray(), k, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) =>
      s"""${ev.value} = graft.functions.VectorKernels.ivfCells(
         |  $v.toDoubleArray(), $cs.toDoubleArray(), $k, $nprobe);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, centroids = r)
}

/** Dense row-major matrix-vector product: out[i] = sum_j M[i*d+j] * v[j]
  * for a FLAT [rows][d] literal matrix. One generated double loop per row —
  * the rotation step of OPQ (orthogonal transform before product
  * quantization) runs through this, so rotating a corpus stays a map-side
  * whole-stage-codegen pass. */
case class MatVec(mat: Expression, vec: Expression, rows: Int)
    extends BinaryExpression {

  override def left: Expression = mat
  override def right: Expression = vec
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(m: Any, v: Any): Any =
    VectorKernels.matVec(
      m.asInstanceOf[ArrayData].toDoubleArray(),
      v.asInstanceOf[ArrayData].toDoubleArray(), rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, v) =>
      s"""${ev.value} = graft.functions.VectorKernels.matVec(
         |  $m.toDoubleArray(), $v.toDoubleArray(), $rows);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(mat = l, vec = r)
}

/** [[MatVec]] against a CONSTANT matrix packed into a BINARY literal
  * (little-endian doubles) instead of an array<double> literal. A
  * 32768-element array literal (256 SRP hyperplanes × 128 dims) turned
  * out to poison the whole query around it: every plan copy /
  * canonicalization / cache-lookup / plan-string pass walks the boxed
  * ArrayData element-wise, and with the literal appearing on both sides
  * of the candidate self-join the per-ACTION overhead reached tens of
  * seconds on a 500-row input and GREW with each derived frame
  * (measured: a cached 16k-row count 2.6 s, its union-distinct 19 s).
  * A binary literal is one flat primitive array — equality is memcmp,
  * toString is O(1) — and the doubles are unpacked ONCE per task into a
  * plain double[] referenced directly by codegen. */
case class MatVecLit(mat: Expression, vec: Expression, rows: Int)
    extends BinaryExpression {

  override def left: Expression = mat
  override def right: Expression = vec
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec_lit"

  @transient private lazy val matArr: Array[Double] =
    MatVecLit.unpack(mat.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(m: Any, v: Any): Any =
    VectorKernels.matVec(
      matArr, v.asInstanceOf[ArrayData].toDoubleArray(), rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val mm = ctx.addReferenceObj("matArr", matArr, "double[]")
      s"""${ev.value} = graft.functions.VectorKernels.matVec(
         |  $mm, $v.toDoubleArray(), $rows);""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(mat = l, vec = r)
}

object MatVecLit {
  def pack(m: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(m.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    m.foreach(bb.putDouble)
    bb.array()
  }

  def unpack(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(i * 8); i += 1 }
    out
  }
}

/** SRP band packing: slice the hyperplane-projection array into `bands`
  * groups of `bits` signs and pack each group into an int bucket id
  * (bit i set iff projection > 0). Exists as a kernel — rather than a
  * transform/aggregate HOF over the projection column — because Catalyst
  * inlines the projection expression into HOF lambdas when collapsing
  * projections, and HOFs evaluate interpreted with no subexpression
  * elimination: a [[MatVec]] feeding element_at inside a lambda re-runs
  * the full rows×dim product PER ELEMENT ACCESS (measured 65 s for 500
  * docs at 256×128). As a regular unary expression the projection child
  * evaluates exactly once per row and the whole chain stays inside
  * whole-stage codegen. */
case class SignBands(proj: Expression, bits: Int, bands: Int)
    extends UnaryExpression {

  override def child: Expression = proj
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sign_bands"

  override def nullSafeEval(p: Any): Any =
    VectorKernels.signBands(p.asInstanceOf[ArrayData], bits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.VectorKernels.signBands($p, $bits, $bands);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(proj = c)
}

/** All projection signs as one packed long-array bitset — see
  * [[VectorKernels.packSigns]]. */
case class PackSigns(proj: Expression) extends UnaryExpression {
  override def child: Expression = proj
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_pack_signs"

  override def nullSafeEval(p: Any): Any =
    VectorKernels.packSigns(p.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.VectorKernels.packSigns($p);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(proj = c)
}

/** Hamming distance between two packed sign bitsets — see
  * [[VectorKernels.hamming]]. */
case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.hamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ decode: reconstruct the quantized vector from its m code bytes and
  * the flat [sub][centroid][dsub] codebook — the encode-time half of
  * residual (IVF x PQ) composition, where the reconstruction is added back
  * onto the cell centroid to recover norms. */
case class PQDecode(codes: Expression, codebook: Expression, k: Int, dsub: Int)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = codebook
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"

  override def nullSafeEval(cd: Any, cb: Any): Any =
    VectorKernels.pqDecode(
      cd.asInstanceOf[Array[Byte]],
      cb.asInstanceOf[ArrayData].toDoubleArray(), k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cd, cb) =>
      s"""${ev.value} = graft.functions.VectorKernels.pqDecode(
         |  $cd, $cb.toDoubleArray(), $k, $dsub);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(codes = l, codebook = r)
}

/** Inverted-multi-index cell id (Babenko & Lempitsky): the vector's two
  * halves are quantized independently against per-half codebooks (flat
  * [2][k][dsub]) and the cell id is code0 * k + code1 — k^2 effective
  * cells from 2k driver-trainable centroids, the standard continuation
  * when sqrt(corpus) exceeds a flat quantizer's feasible cell count. */
case class ImiCell(vec: Expression, codebook: Expression, k: Int, dsub: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_imi_cell"

  override def nullSafeEval(v: Any, cb: Any): Any =
    VectorKernels.imiCell(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      cb.asInstanceOf[ArrayData].toDoubleArray(), k, dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"""${ev.value} = graft.functions.VectorKernels.imiCell(
         |  $v.toDoubleArray(), $cb.toDoubleArray(), $k, $dsub);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

/** Multi-probe IMI: top `perHalf` codes per half by distance, crossed into
  * perHalf^2 candidate cell ids. cells(0) == [[ImiCell]] (same distance and
  * tie rules, best x best combination first). */
case class ImiCells(vec: Expression, codebook: Expression, k: Int, dsub: Int, perHalf: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = codebook
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_imi_cells"

  override def nullSafeEval(v: Any, cb: Any): Any =
    VectorKernels.imiCells(
      v.asInstanceOf[ArrayData].toDoubleArray(),
      cb.asInstanceOf[ArrayData].toDoubleArray(), k, dsub, perHalf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"""${ev.value} = graft.functions.VectorKernels.imiCells(
         |  $v.toDoubleArray(), $cb.toDoubleArray(), $k, $dsub, $perHalf);""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, codebook = r)
}

object VectorExpressions {

  /** Register the graft expressions in the session's function registry
    * (idempotent), making them available to both the Column API and
    * spark.sql. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sq8_encode", exprs => SQ8Encode(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sq8_dot", exprs => SQ8Dot(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
    def i(e: Expression): Int = e.eval().asInstanceOf[Int]
    reg.createOrReplaceTempFunction(
      "graft_pq_encode", exprs =>
        PQEncode(exprs(0), exprs(1), i(exprs(2)), i(exprs(3)), i(exprs(4))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_dot", exprs =>
        PQAdcDot(exprs(0), exprs(1), exprs(2), i(exprs(3)), i(exprs(4))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_normsq", exprs => PQNormSq(exprs(0), exprs(1), i(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_ivf_cell", exprs => IvfCell(exprs(0), exprs(1), i(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_ivf_cells", exprs =>
        IvfCells(exprs(0), exprs(1), i(exprs(2)), i(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_matvec", exprs => MatVec(exprs(0), exprs(1), i(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_sign_bands", exprs =>
        SignBands(exprs(0), i(exprs(1)), i(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pack_signs", exprs => PackSigns(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_hamming", exprs => HammingDist(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_matvec_lit", exprs =>
        MatVecLit(exprs(0), exprs(1), i(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_pq_decode", exprs =>
        PQDecode(exprs(0), exprs(1), i(exprs(2)), i(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_imi_cell", exprs =>
        ImiCell(exprs(0), exprs(1), i(exprs(2)), i(exprs(3))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_imi_cells", exprs =>
        ImiCells(exprs(0), exprs(1), i(exprs(2)), i(exprs(3)), i(exprs(4))), "built-in")
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_dot", a, b)
  }

  def sq8Encode(spark: SparkSession, v: Column, lo: Column, step: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_sq8_encode", v, lo, step)
  }

  def sq8Dot(spark: SparkSession, q: Column, codes: Column, lo: Column, step: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_sq8_dot", q, codes, lo, step)
  }

  import org.apache.spark.sql.functions.lit

  def pqEncode(spark: SparkSession, v: Column, codebook: Column, m: Int, k: Int, dsub: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_pq_encode", v, codebook, lit(m), lit(k), lit(dsub))
  }

  def pqDot(spark: SparkSession, q: Column, codes: Column, codebook: Column, k: Int, dsub: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_pq_dot", q, codes, codebook, lit(k), lit(dsub))
  }

  def pqNormSq(spark: SparkSession, codes: Column, normSq: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pq_normsq", codes, normSq, lit(k))
  }

  def ivfCell(spark: SparkSession, v: Column, centroids: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_ivf_cell", v, centroids, lit(k))
  }

  def ivfCells(spark: SparkSession, v: Column, centroids: Column, k: Int, nprobe: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_ivf_cells", v, centroids, lit(k), lit(nprobe))
  }

  def matVec(spark: SparkSession, mat: Column, v: Column, rows: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_matvec", mat, v, lit(rows))
  }

  def signBands(spark: SparkSession, proj: Column, bits: Int, bands: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_sign_bands", proj, lit(bits), lit(bands))
  }

  def packSigns(spark: SparkSession, proj: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_pack_signs", proj)
  }

  def hamming(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_hamming", a, b)
  }

  /** [[MatVecLit]]: mat is a CONSTANT Scala matrix, shipped as a packed
    * binary literal (see the expression's scaladoc for why). */
  def matVecConst(
      spark: SparkSession, mat: Array[Double], v: Column, rows: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_matvec_lit", lit(MatVecLit.pack(mat)), v, lit(rows))
  }

  def pqDecode(spark: SparkSession, codes: Column, codebook: Column, k: Int, dsub: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_pq_decode", codes, codebook, lit(k), lit(dsub))
  }

  def imiCell(spark: SparkSession, v: Column, codebook: Column, k: Int, dsub: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_imi_cell", v, codebook, lit(k), lit(dsub))
  }

  def imiCells(
      spark: SparkSession, v: Column, codebook: Column,
      k: Int, dsub: Int, perHalf: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "graft_imi_cells", v, codebook, lit(k), lit(dsub), lit(perHalf))
  }
}
