package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of registry queries without running
  * them: explain-one <sfDir> <query...> — the plan-shape feedback loop
  * (shuffle count, codegen spans, pushed filters) for any registry entry. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.prepare(spark)
    names.foreach { name =>
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
