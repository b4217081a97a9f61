package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise vector-sum AGGREGATE (`graft_vec_sum`) — the custom
  * Catalyst aggregate completing the §2.7 UDF surface (scalar kernels
  * already exist; this is the `TypedImperativeAggregate` shape): buffer
  * is one primitive double array per group, update adds the input vector
  * elementwise, merge adds buffers, result is `array<double>`.
  *
  * The motivating use is DISTRIBUTED Lloyd's refinement
  * ([[graft.ext.IvfKMeans.refineCentroids]]): per-cell vector sums +
  * counts in ONE aggregation over the full corpus — map-side partial
  * aggregation does most of the addition before the (k-row) shuffle, so
  * a refinement pass over 100 TB costs one assignment scan + one
  * k-row-out aggregate, with no per-row state anywhere. A SQL
  * formulation (posexplode + groupBy(cell, pos)) shuffles n·dim rows
  * instead of k buffers.
  *
  * Buffers size themselves lazily from the first input vector, so the
  * aggregate needs no dim parameter. NOTE: float addition is reordered
  * across partitions, so results are deterministic only up to
  * floating-point associativity — fine for centroid math, not for
  * hash-gated oracle columns. */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    val b = if (buffer.length == 0) new Array[Double](arr.length) else buffer
    // all vectors in a group must share one dimensionality: summing a
    // shorter vector would silently drop tail elements and a longer one
    // would read past the buffer — fail loudly instead
    if (arr.length != b.length)
      throw new IllegalArgumentException(
        s"graft_vec_sum: mixed vector lengths in one group " +
          s"(${b.length} vs ${arr.length})")
    var i = 0
    while (i < arr.length) { b(i) += arr(i); i += 1 }
    b
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    if (b1.length == 0) return b2
    if (b2.length == 0) return b1
    if (b1.length != b2.length)
      throw new IllegalArgumentException(
        s"graft_vec_sum: mixed vector lengths across partial buffers " +
          s"(${b1.length} vs ${b2.length})")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer.length == 0) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    var i = 0
    while (i < buffer.length) { bb.putDouble(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VecAgg {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum",
      exprs => VecSumAgg(exprs.head).toAggregateExpression(), "built-in")

  /** Column API: elementwise sum of an `array<double>` column. */
  def vecSum(spark: SparkSession, v: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_vec_sum", v)
  }
}
