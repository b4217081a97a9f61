package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N-fold amplifier for the driver testdata — used to measure
  * per-query SCALING EXPONENTS (does a plan stay ~linear when rows grow
  * 10x?) when no larger scale factor is provisioned.
  *
  * Each replica k shifts every entity key (users, docs, vectors, orders,
  * customers) past the original id range, so key CARDINALITY scales with
  * volume the way a real corpus grows. Content is PERTURBED per replica —
  * document text through a per-replica letter substitution (cross-replica
  * shingle sets become disjoint; intra-replica near-dup structure is
  * preserved exactly) and embeddings through per-dim additive noise
  * (breaks exact colinearity so replicas are not artificial cosine-1.0
  * twins). Without this, every doc/vector would acquire N-1 perfect
  * duplicates — a pair-count explosion no real 10x corpus exhibits.
  * Dimension tables (region/nation/supplier/part) stay fixed, as in TPC-H
  * scaling. `usage: ScaleData <srcSfDir> <outDir> <factor>` */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = args(2).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shiftBy(table: DataFrame, keyCols: Seq[String]): Seq[DataFrame] = {
      val spans = keyCols.map(c =>
        c -> (table.agg(max(col(c))).first().getLong(0) + 1L)).toMap
      (0 until n).map { k =>
        keyCols.foldLeft(table)((d, c) => d.withColumn(c, col(c) + lit(k * spans(c))))
      }
    }
    // emit a single FILE named <t>.parquet (matching the driver layout —
    // the streaming gate queries select their source via pathGlobFilter on
    // the file name); row-group splits keep single-file scans parallel
    def write(dfs: Seq[DataFrame], name: String): Unit = {
      val stage = s"$out/.stage_$name"
      dfs.reduce(_ union _).coalesce(1).write.mode("overwrite").parquet(stage)
      val stageDir = new java.io.File(stage)
      val part = stageDir.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(s"$out/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      stageDir.listFiles().foreach(_.delete()); stageDir.delete()
      println(s"[scale] wrote $name x$n")
    }

    // per-replica letter substitution: cyclic shift of 'a'..'j' by k
    def perturbText(k: Int)(c: org.apache.spark.sql.Column) = {
      val alpha = "abcdefghij"
      val to = alpha.drop(k % alpha.length) + alpha.take(k % alpha.length)
      if (k == 0) c else translate(c, alpha, to)
    }

    // documents: keys shift, text perturbs per replica
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    write((0 until n).map { k =>
      docs.withColumn("doc_id", col("doc_id") + lit(k * docSpan))
        .withColumn("text", perturbText(k)(col("text")))
    }, "documents")

    // embeddings: keys shift, per-dim additive noise breaks colinearity
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vecSpan = emb.agg(max(col("vec_id"))).first().getLong(0) + 1L
    write((0 until n).map { k =>
      emb.withColumn("vec_id", col("vec_id") + lit(k * vecSpan))
        .withColumn("embedding",
          if (k == 0) col("embedding")
          else zip_with(col("embedding"), sequence(lit(1), lit(64)),
            (x, d) => (x + (pmod(lit(k) * d, lit(7)) - lit(3.0)) * lit(0.01f)).cast("float")))
    }, "embeddings")

    // events: ts passes through in whatever physical layout the source
    // generation uses (Tables.normalizeEventsTs adapts on read); event
    // volume per hour scales with the user population
    val events = spark.read.parquet(s"$src/events.parquet")
    write(shiftBy(events, Seq("event_id", "user_id")), "events")

    // orders/lineitem/customer share key SPANS so join relationships
    // survive replication (replica k of an order references replica k of
    // its customer and carries replica k of its line items)
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val customer = spark.read.parquet(s"$src/customer.parquet")
    val orderSpan = orders.agg(max(col("o_orderkey"))).first().getLong(0) + 1L
    val custSpan = customer.agg(max(col("c_custkey"))).first().getLong(0) + 1L
    write((0 until n).map { k =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(k * orderSpan))
        .withColumn("o_custkey", col("o_custkey") + lit(k * custSpan))
    }, "orders")
    write((0 until n).map { k =>
      lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(k * orderSpan))
    }, "lineitem")
    write((0 until n).map { k =>
      customer.withColumn("c_custkey", col("c_custkey") + lit(k * custSpan))
    }, "customer")

    // fixed dimensions: copy through
    Seq("region", "nation", "supplier", "part").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$src/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[scale] copied $t")
    }
    spark.stop()
  }
}
