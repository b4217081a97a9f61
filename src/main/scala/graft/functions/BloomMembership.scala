package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.util.sketch.BloomFilter

/** Count of array elements that hit a pre-built Bloom filter — the
  * membership kernel behind [[graft.ext.PipelineOps.decontaminateBloom]].
  *
  * The filter travels OUTSIDE the expression tree: its serialized bitset
  * is a constructor field surfaced to generated code through
  * `ctx.addReferenceObj`, never a `Literal` — a megabit bitset as an
  * array literal would poison constant folding and plan printing the
  * same way the SRP hyperplane matrix once did (see
  * `Similarity.srpNearDup`). Deserialization is one lazy readFrom per
  * executor; the per-row work is k murmur probes per element inside the
  * scan's whole-stage span (no HOF lambda — Spark's `ArrayFilter` is
  * CodegenFallback, a hand-rolled counting expression is not).
  *
  * Spark's `BloomFilterImpl` is deterministic: bit positions come from
  * seed-fixed Murmur3 double hashing and the distributed build merges
  * partial filters by bitwise OR, so the counted hits are independent of
  * partitioning and insertion order — what makes a hash-checked oracle
  * over bloom-derived booleans possible at all. */
case class BloomCountHits(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bloom_hits"

  def countHits(arr: ArrayData): Int = {
    var i = 0
    var hits = 0
    val n = arr.numElements()
    while (i < n) {
      if (bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(arr: Any): Any =
    countHits(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHits", this, classOf[BloomCountHits].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.countHits($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCountHits =
    copy(child = newChild)

  // keep plan strings readable: never print the bitset
  override def toString: String = s"graft_bloom_hits($child)"
  override def sql: String = s"graft_bloom_hits(${child.sql})"
}

/** Exact sibling of [[BloomCountHits]]: count of array elements present
  * in a fixed string set, with the set living in the expression (closure
  * + `addReferenceObj`), not the plan. Replaces
  * `size(array_intersect(arr, typedlit(set)))` in per-row scoring:
  * Catalyst's ArrayIntersect rebuilds the literal-side hash set on EVERY
  * row (~|set| UTF8String hashes per row — 0.44 ms/row against a 2.2k
  * shingle set, the whole cost of streaming decontamination at the x10
  * gate); here the set is built once per executor and each row pays only
  * |arr| lookups. Exact same count as the array_intersect form when
  * `arr` is distinct (our shingle kernels emit distinct arrays). */
case class SetCountHits(child: Expression, elems: Array[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, (elems.length / 0.75).toInt))
    elems.foreach(e =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(e)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_set_hits"

  def countHits(arr: ArrayData): Int = {
    var i = 0
    var hits = 0
    val n = arr.numElements()
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override def nullSafeEval(arr: Any): Any =
    countHits(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setHits", this, classOf[SetCountHits].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.countHits($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): SetCountHits =
    copy(child = newChild)

  override def toString: String = s"graft_set_hits($child)"
  override def sql: String = s"graft_set_hits(${child.sql})"
}

object BloomMembership {

  /** Distributed Bloom build over a single string column: partial filters
    * per partition merged by OR (order-independent), only the compact
    * bitset returns to the driver. `expected` sizes the bitset; pass the
    * actual distinct count for nominal-fpp behavior. */
  def build(values: DataFrame, colName: String, expected: Long,
      fpp: Double): Array[Byte] = {
    val bloom = values.stat.bloomFilter(colName, math.max(expected, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Column API: number of elements of string-array `arr` the serialized
    * filter might contain. The filter travels through the registered
    * builder's CLOSURE, never the plan: each distinct bitset registers a
    * content-addressed temp function (`graft_bloom_hits_<md5-prefix>`),
    * so the argument list stays literal-free and re-registration of the
    * same filter is idempotent. */
  def countHits(spark: SparkSession, arr: Column,
      bloomBytes: Array[Byte]): Column = {
    val name = "graft_bloom_hits_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(bloomBytes).take(6).map("%02x".format(_)).mkString
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (children: Seq[Expression]) => BloomCountHits(children.head, bloomBytes),
      "built-in")
    org.apache.spark.sql.functions.call_function(name, arr)
  }

  /** Column API for [[SetCountHits]] — same content-addressed closure
    * registration as [[countHits]], exact membership instead of Bloom.
    * Each element is length-framed in the digest: raw concatenation would
    * make distinct sets like ["ab","c"] and ["a","bc"] collide to one
    * function name, and createOrReplaceTempFunction would then silently
    * rebind an earlier Column to the wrong membership set. */
  def countSetHits(spark: SparkSession, arr: Column,
      elems: Seq[String]): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val lenBuf = java.nio.ByteBuffer.allocate(4)
    elems.foreach { e =>
      val b = e.getBytes("UTF-8")
      lenBuf.clear(); lenBuf.putInt(b.length)
      md.update(lenBuf.array())
      md.update(b)
    }
    val name = "graft_set_hits_" +
      md.digest().take(6).map("%02x".format(_)).mkString
    val arrElems = elems.toArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      (children: Seq[Expression]) => SetCountHits(children.head, arrElems),
      "built-in")
    org.apache.spark.sql.functions.call_function(name, arr)
  }
}
