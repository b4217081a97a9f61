package graft

import graft.ext.Dedup
import graft.sources.Tables
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MinHash near-dup finds exactly the batch operator's pairs
  * (same md5 hash family -> same buckets -> same verified candidates),
  * including pairs whose two documents arrive in different micro-batches. */
class StreamingNearDupSpec extends AnyFunSuite with SparkSpec {

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming near-dup pairs equal batch minhashNearDup on sf0.001") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))

    val expected = Dedup.minhashNearDup(docs, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)

    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val chunks = rows.grouped(rows.length / 3 + 1).toSeq

    val input = MemoryStream[(Long, String)]
    val query = StreamingNearDup(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(c.toSeq); query.processAllAvailable() }
    } finally query.stop()

    val got = spark.table("neardup_out").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }
}
