package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64 SimHash vote bits from md5, as ONE long: bit b of the result equals
  * bit (b % 4) of hex digit (b / 4) of md5(input) — exactly the value the
  * portable SimHash previously extracted with 16 `conv(substr(md5(x)...))`
  * string ops per shingle ([[graft.ext.Dedup.simhashPortable]]). Packing
  * the digits into a long turns the per-shingle work into one digest plus
  * shifts, while staying bit-identical to the DuckDB oracle's substr/conv
  * reproduction (oracle unchanged, q_simhash stays hash-checked).
  */
case class Md5Sim64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_sim64"

  override def nullSafeEval(input: Any): Any =
    Md5Sim.sim64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Sim.sim64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Sim {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Pack the first 16 hex digits (= first 8 bytes) of md5(bytes) into a
    * long, digit i at bits [4i, 4i+3] in the digit's own bit order — so
    * `(v >> b) & 1` reads SimHash vote bit b directly. */
  def sim64(bytes: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) {
      val b = d(k) & 0xff
      v |= (b >>> 4).toLong << (8 * k) // high nibble = hex digit 2k
      v |= (b & 0xf).toLong << (8 * k + 4) // low nibble = hex digit 2k+1
      k += 1
    }
    v
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_md5_sim64", exprs => Md5Sim64(exprs(0)), "built-in")

  def apply(spark: SparkSession, text: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_md5_sim64", text)
  }
}
