package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Measures whether q_json's JSON extraction is one-pass.
  *
  * The suspicion (VERDICT r13 #5): `withColumn(k, get_json_object) +
  * where(k > 50)` lets Catalyst push the extraction into the filter AND
  * re-evaluate it in the project, parsing `props` twice per surviving
  * row; and `get_json_object`'s path evaluator may cost more than a
  * one-pass `from_json` with a 1-field struct schema. This probe times
  * (a) a bare events scan (the floor), (b) the registry q_json as-is,
  * (c) the from_json struct variant, 3 reps each after a warm-up, and
  * prints whether the filter/project stage duplicates the parse
  * (counted in the executed plan text).
  */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.events(spark, dir)

    def time3(label: String)(df: => org.apache.spark.sql.DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(f"[jsonprobe] $label%-22s min=${best}%.3f s  runs=${secs.map(s => f"$s%.3f").mkString(",")}")
      best
    }

    val scan = time3("events-scan")(ev.select("event_id", "event_type", "props"))
    val current = graft.queries.Registry.queries("q_json")(spark, dir)
    val cPlan = current.queryExecution.executedPlan.toString
    println("[jsonprobe] q_json plan get_json_object count: " +
      "get_json_object".r.findAllIn(cPlan).size +
      ", from_json count: " + "from_json".r.findAllIn(cPlan).size)
    val cur = time3("q_json-registry")(current)
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val fj = ev
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .where(col("k") > 50)
      .select("event_id", "event_type", "k")
    val fjPlan = fj.queryExecution.executedPlan.toString
    println("[jsonprobe] from_json variant plan from_json count: " +
      "from_json".r.findAllIn(fjPlan).size +
      ", get_json_object count: " + "get_json_object".r.findAllIn(fjPlan).size)
    val fjs = time3("q_json-from_json")(fj)
    // one parse per row, no filter: the floor for a single-pass plan
    val parseOnly = time3("parse-only-project")(
      ev.select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k")))
    // filter-only (no k in output): isolates the filter-side parse
    val filterOnly = time3("filter-only")(
      ev.where(get_json_object(col("props"), "$.k").cast("int") > 50)
        .select("event_id", "event_type"))
    // json_tuple is a Generator: the filter on its output cannot be
    // pushed through the Generate, so props is parsed exactly once
    val jt = ev
      .select(col("event_id"), col("event_type"), col("props"))
      .selectExpr("event_id", "event_type", "json_tuple(props, 'k') AS k")
      .withColumn("k", col("k").cast("int"))
      .where(col("k") > 50)
      .select("event_id", "event_type", "k")
    println("[jsonprobe] json_tuple plan:\n" +
      jt.queryExecution.executedPlan.toString.linesIterator.take(8)
        .mkString("\n"))
    val jts = time3("q_json-json_tuple")(jt)
    println(f"[jsonprobe] parse cost over scan: current=${cur - scan}%.3f s, " +
      f"from_json=${fjs - scan}%.3f s, parseOnly=${parseOnly - scan}%.3f s, " +
      f"filterOnly=${filterOnly - scan}%.3f s, jsonTuple=${jts - scan}%.3f s")
    spark.stop()
  }
}
