package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): media as opaque `binary`
  * payload columns plus typed metadata, processed in partition-parallel
  * batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE standing in for a real decoder. The
  * Spark-side plumbing — schema, batch iteration via mapPartitions (the
  * Scala analog of mapInPandas batches), partition parallelism, feature
  * vector shape — is real and tested; swapping `decodeStub` for a codec
  * call is the only change needed in production.
  */
object Multimodal {

  val featureDim = 8

  /** STUB decoder: pretends `payload` is an encoded image and emits a
    * deterministic fake (width, height, feature vector) derived only from
    * the bytes. Replace with a real codec (e.g. libjpeg/ffmpeg) off-container. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    val n = payload.length
    val width = 16 + (if (n == 0) 0 else payload(0) & 0x3f)
    val height = 16 + (if (n < 2) 0 else payload(1) & 0x3f)
    // fake features: per-bucket mean byte value over featureDim byte buckets
    val feats = Array.ofDim[Double](featureDim)
    val counts = Array.ofDim[Long](featureDim)
    var i = 0
    while (i < n) {
      val b = i % featureDim
      feats(b) += (payload(i) & 0xff).toDouble
      counts(b) += 1
      i += 1
    }
    var j = 0
    while (j < featureDim) {
      if (counts(j) > 0) feats(j) = feats(j) / counts(j)
      j += 1
    }
    (width, height, feats)
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Feature extraction over a binary payload column: partition-parallel,
    * no driver-side materialization; each partition streams rows through
    * the (stub) decoder. Input must have (doc_id: long, payload: binary). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val (w, h, f) = decodeStub(payload)
        Row(id, payload.length.toLong, w, h, f.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Documents → media table: text bytes standing in for an encoded blob,
    * with typed metadata carried alongside the opaque payload. */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("lang"), col("source"), col("n_chars")).as("meta"))
}
