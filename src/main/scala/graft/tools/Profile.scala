package graft.tools

import graft.ext.{Dedup, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for the near-dup pipeline. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    time("tokens only")(docs.select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("t")).write.format("noop").mode("overwrite").save())
    time("tokens repart")(docs.repartition(8).select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("t")).write.format("noop").mode("overwrite").save())
    val sh = Dedup.docShingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles materialize")(sh.count())
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    time("sizes")(sz.count())
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("freq"))
    time("freq")(freq.count())
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val interNaive = a.join(b, Seq("shingle")).where(col("doc_a") < col("doc_b"))
    time("naive pair rows")(println("  pairs=" + interNaive.count()))
    val grouped = interNaive.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    time("naive inter grouped")(grouped.count())
    val full = Dedup.jaccardNearDup(docs, 0.7)
    time("jaccardNearDup full")(full.count())
    val mh = Dedup.minhashNearDup(docs, 0.7)
    time("minhashNearDup full")(mh.count())
    val ev = Tables.events(spark, sfDir)
    time("events scan")(ev.write.format("noop").mode("overwrite").save())
    val qj = graft.queries.Registry.queries("q_json")(spark, sfDir)
    time("q_json 1st")(qj.write.format("noop").mode("overwrite").save())
    time("q_json 2nd")(qj.write.format("noop").mode("overwrite").save())
    val qj2 = ev.withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType)))).getField("k"))
      .where(col("k") > 50).select("event_id", "event_type", "k")
    time("q_json from_json")(qj2.write.format("noop").mode("overwrite").save())
    val fl = graft.queries.Registry.queries("q_flagship")(spark, sfDir)
    val plan = fl.queryExecution.executedPlan.toString
    println("[profile] flagship ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).size)
    println("[profile] flagship Exchange count: " + "\\bExchange\\b".r.findAllIn(plan).size)
    time("q_flagship")(fl.write.format("noop").mode("overwrite").save())
    println("[profile] entry() smoke rows=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}
