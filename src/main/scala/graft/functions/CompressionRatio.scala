package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string: compressed_size / raw_size.
  * The classic text-quality signal for LLM corpus filtering — boilerplate
  * and repeated spans compress far below ~0.4, high-entropy noise sits
  * near 1.0, natural prose in between. Deterministic (fixed level, no
  * dictionary), so results are stable across runs and partitionings;
  * rows-only at the gate (DuckDB has no deflate) with behavior pinned in
  * unit tests.
  */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_compress_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CompressionRatio.ratio($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionRatio {

  /** deflate(bytes).length / bytes.length; 1.0 for empty input. */
  def ratio(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 1.0
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(bytes)
    deflater.finish()
    val buf = new Array[Byte](1024)
    var total = 0L
    while (!deflater.finished()) total += deflater.deflate(buf)
    deflater.end()
    total.toDouble / bytes.length
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_compress_ratio", exprs => CompressRatio(exprs(0)), "built-in")

  def apply(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_compress_ratio", text)
  }
}
