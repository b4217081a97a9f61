package graft.tools

import org.apache.spark.sql.SparkSession

/** Schema-drift tripwire. The driver regenerates /root/testdata between
  * rounds and has already changed physical layouts once (events.ts:
  * TIMESTAMP(NANOS)-as-long → timestamp[us], which silently cost round 9
  * all 19 events queries). This prints a one-line diff per table against
  * the expected logical schema so a regeneration surfaces as a named
  * diagnostic at round start instead of 19 absent correctness rows.
  *
  * Never fatal: unexpected drift prints `[schema] DRIFT ...` and execution
  * continues (the loaders are schema-adaptive where drift is known).
  */
object SchemaCheck {

  /** table -> expected (column, acceptable Spark type simpleStrings). */
  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "events" -> Seq(
      "event_id" -> Set("bigint"),
      // all three layouts the loader normalizes (Tables.normalizeEventsTs)
      "ts" -> Set("bigint", "timestamp", "timestamp_ntz"),
      "user_id" -> Set("bigint"),
      "event_type" -> Set("string"),
      "value" -> Set("double"),
      "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"),
      "text" -> Set("string"),
      "lang" -> Set("string"),
      "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"),
      "label" -> Set("int")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"),
      "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"),
      "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"),
      "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"),
      "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"),
      "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("date", "timestamp", "timestamp_ntz")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"),
      "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"),
      "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("date", "timestamp", "timestamp_ntz"),
      "o_orderpriority" -> Set("string")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"),
      "c_name" -> Set("string"),
      "c_nationkey" -> Set("int", "bigint"),
      "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"),
      "s_name" -> Set("string"),
      "s_nationkey" -> Set("int", "bigint"),
      "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"),
      "p_name" -> Set("string"),
      "p_brand" -> Set("string"),
      "p_type" -> Set("string"),
      "p_size" -> Set("int"),
      "p_retailprice" -> Set("double")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int", "bigint"),
      "n_name" -> Set("string"),
      "n_regionkey" -> Set("int", "bigint")),
    "region" -> Seq(
      "r_regionkey" -> Set("int", "bigint"),
      "r_name" -> Set("string")))

  /** Returns the list of drift messages (empty = all expected). */
  def check(spark: SparkSession, sfDir: String): Seq[String] = {
    graft.sources.Tables.prepare(spark)
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val actual = spark.read.parquet(s"$sfDir/$table.parquet").schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        val missing = cols.collect {
          case (c, _) if !actual.contains(c) => s"$table.$c MISSING"
        }
        val retyped = cols.collect {
          case (c, ok) if actual.contains(c) && !ok.contains(actual(c)) =>
            s"$table.$c is ${actual(c)} (expected one of ${ok.mkString("/")})"
        }
        missing ++ retyped
      } catch {
        case e: Throwable => Seq(s"$table UNREADABLE: ${e.getMessage}")
      }
    }
  }

  /** Print-only entry point used by Verify and runnable standalone. */
  def report(spark: SparkSession, sfDir: String): Unit = {
    val drift = check(spark, sfDir)
    if (drift.isEmpty) println(s"[schema] OK: $sfDir matches expectations")
    else drift.foreach(d => println(s"[schema] DRIFT $d"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    report(spark, sfDir)
    spark.stop()
  }
}
