package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch operators (SURVEY.md §2.6):
  * watermark declaration is a parameter everywhere (the reference hard-codes
  * zero lateness, App.java:121; T1), and the changelog/versioned-table
  * machinery (T2/T3) becomes either update-mode aggregation state or the
  * explicit per-key state of [[StreamingFlagship]]. */
object StreamingOps {

  /** Continuous grouped aggregation (A1/A2 streaming form): the query
    * result is the dynamic table; read it in update/complete output mode.
    * State = one row per key (Spark's streaming-agg state store). */
  def runningAggregate(
      events: DataFrame, timeCol: String, delay: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Tumbling event-time window aggregation; append mode emits each window
    * once the watermark passes its end. */
  def tumbling(
      events: DataFrame, timeCol: String, delay: String, width: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy((window(col(timeCol), width) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with an inactivity gap. */
  def sessionized(
      events: DataFrame, timeCol: String, delay: String, gap: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame =
    events.withWatermark(timeCol, delay)
      .groupBy((session_window(col(timeCol), gap) +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup bounded by the watermark (state stays finite). */
  def dedupWithinWatermark(
      events: DataFrame, timeCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Changelog view of a continuous grouped aggregation WITH RETRACTION
    * rows — the reference's `toChangelogStream` RowKind semantics
    * (App.java:83): `+I` the first value emitted for a key, then for every
    * change a `-U` retracting the prior value followed by a `+U` carrying
    * the replacement. Spark's update output mode emits only the latest row
    * per changed key, so the retraction half is reconstructed by diffing
    * each microbatch against the running snapshot of the dynamic table:
    * a per-batch `left` join of the (changed-keys-only) batch against the
    * snapshot — both bounded by the key cardinality, not the event volume,
    * so the diff scales like the aggregation state itself. Snapshot and
    * log are advanced with [[graft.ext.Lineage.cut]] (constant-size plans
    * across batches; no driver buffering — rows stay distributed).
    *
    * Output: (op, batch_id, keys*, values*). Within one batch a key
    * contributes either one `+I` or a `-U`/`+U` pair; batches are atomic
    * units for replay. [[replayChangelog]] folds the log back into the
    * final dynamic-table state (tested equal to the batch aggregation). */
  def changelog(
      events: DataFrame, timeCol: String, delay: String,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = events.sparkSession
    val agg = runningAggregate(events, timeCol, delay, keys, aggs)
    val valCols = agg.schema.fieldNames.filterNot(keys.contains).toSeq
    val logSchema = StructType(
      StructField("op", StringType, nullable = false) +:
        StructField("batch_id", LongType, nullable = false) +: agg.schema.fields)
    val snapshot = new java.util.concurrent.atomic.AtomicReference[DataFrame](
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], agg.schema))
    // per-batch op frames: built ONLY from lineage-cut (LogicalRDD-backed)
    // inputs, so they remain valid after the microbatch's own frame dies —
    // the union + any materialization happens once, after the drain,
    // instead of one extra checkpoint job per batch
    val opFrames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        val b = graft.ext.Lineage.cut(batch.toDF())
        val prev = snapshot.get()
        val prevRen = valCols.foldLeft(prev)((d, c) => d.withColumnRenamed(c, s"__old_$c"))
          .withColumn("__exists", lit(true))
        val j = b.join(prevRen, keys, "left")
        def outCols(op: String, old: Boolean) =
          lit(op).as("op") +: lit(bid).as("batch_id") +:
            (keys.map(col) ++ valCols.map(c => if (old) col(s"__old_$c").as(c) else col(c)))
        val plusI = j.where(col("__exists").isNull).select(outCols("+I", old = false): _*)
        val minusU = j.where(col("__exists").isNotNull).select(outCols("-U", old = true): _*)
        val plusU = j.where(col("__exists").isNotNull).select(outCols("+U", old = false): _*)
        opFrames.add(plusI.union(minusU).union(plusU))
        snapshot.set(graft.ext.Lineage.cut(
          prev.join(b.select(keys.map(col): _*), keys, "left_anti").union(b)))
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val frames = scala.jdk.CollectionConverters.IteratorHasAsScala(
      opFrames.iterator()).asScala.toSeq
    if (frames.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], logSchema)
    else frames.reduce(_ union _)
  }

  /** Fold an op-tagged changelog (from [[changelog]]) back into dynamic-
    * table state: the latest non-retraction row per key wins. */
  def replayChangelog(cl: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    cl.where(col("op") =!= "-U")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("batch_id").desc)))
      .where(col("__rn") === 1)
      .drop("__rn", "op", "batch_id")
  }

  /** Drain a streaming DataFrame (AvailableNow) through a DISTRIBUTED sink
    * and hand the result back as a batch DataFrame: each microbatch appends
    * to parquet via foreachBatch — executors write their own partitions, so
    * results never funnel through driver memory the way `format("memory")`
    * buffers them.
    *
    * Sink location: `sinkDir` when given — the production S4 shape, shared
    * storage the user designates; output stays there and the returned frame
    * reads it. When omitted, a scratch dir under the session's warehouse
    * dir (shared storage on a real cluster, unlike a driver-local temp
    * path) is used, the bounded result is materialized off it, and the
    * scratch dir is deleted — nothing leaks per run. */
  def runToParquet(df: DataFrame, name: String, sinkDir: Option[String] = None): DataFrame =
    runBatchesToParquet(df, name, identity, sinkDir)

  /** As [[runToParquet]], but each microbatch is first passed through
    * `transform` — the escape hatch for per-batch logic Structured
    * Streaming cannot express statefully (joins + aggregations against
    * static reference frames, e.g. containment-on-ingest). The output
    * schema is derived by applying `transform` to an empty batch-shaped
    * frame, so zero-batch streams still return a typed empty result. */
  def runBatchesToParquet(
      df: DataFrame, name: String,
      transform: DataFrame => DataFrame,
      sinkDir: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.{Dataset, Row}
    val spark = df.sparkSession
    val dir = sinkDir.getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      s"$wh/graft_stream/${name}_${java.util.UUID.randomUUID().toString.take(8)}"
    }
    val outSchema = transform(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], df.schema)).schema
    val q = df.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        transform(batch.toDF()).write.mode("append").parquet(dir)
      }
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // zero-batch stream: no files were written; preserve the schema
    val wrote = fs.exists(hPath) &&
      fs.listStatus(hPath).exists(_.getPath.getName.endsWith(".parquet"))
    if (sinkDir.isDefined) {
      if (wrote) spark.read.schema(outSchema).parquet(dir)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    } else {
      // scratch mode: materialize the (bounded, watermark-closed) result,
      // then remove the scratch dir so repeated gate runs leave no residue
      val out =
        if (wrote) spark.read.schema(outSchema).parquet(dir).localCheckpoint()
        else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
      if (fs.exists(hPath)) fs.delete(hPath, true)
      out
    }
  }
}
