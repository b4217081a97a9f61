package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The driver-comparator contract, spec-pinned: every registry query's
  * output is written to parquet by Verify and round-tripped through a
  * pandas `sort_values` over ALL columns — which cannot sort (or hash)
  * array/map/struct cells. `q_vec_pool` shipped a raw `array<long>`
  * column in round 10 and was the registry's only red row for exactly
  * this reason; the repo convention is to stringify
  * (`concat_ws`/`array_to_string`, see q_array_agg). This spec makes the
  * contract structural: reintroducing a nested top-level column in any
  * query goes red HERE, before the driver ever sees it.
  *
  * Batch queries are checked lazily (plan-time schema, no execution);
  * streaming queries necessarily drain their bounded input when built,
  * so the whole sweep runs against the tiny sf0.001 corpus.
  */
class RegistryShapeSpec extends AnyFunSuite with SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  /** True if the physical plan (including AQE-wrapped inner plans and
    * subquery plans) contains a CartesianProductExec. */
  private def hasCartesian(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    val self = p match {
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec => true
      case _ => false
    }
    val aqeInner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasCartesian(a.executedPlan)
      case _ => false
    }
    self || aqeInner ||
      p.children.exists(hasCartesian) || p.subqueries.exists(hasCartesian)
  }

  test("every query has an oracle (or a documented rows-only waiver)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracleSql entries: ${noOracle.toSeq.sorted.mkString(", ")}")
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without queries: ${orphanOracles.toSeq.sorted.mkString(", ")}")
  }

  test("no registry query emits a top-level array/map/struct column, " +
      "and none plans a CartesianProduct") {
    val shapeOffenders = Seq.newBuilder[String]
    val cartesianOffenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.schema.fields.foreach { f =>
        if (f.dataType.isInstanceOf[ArrayType]
          || f.dataType.isInstanceOf[MapType]
          || f.dataType.isInstanceOf[StructType])
          shapeOffenders += s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      // CartesianProductExec = a cross join where NEITHER side broadcast
      // — O(n*m) over two corpus-sized inputs, the one join shape with no
      // 100 TB story. (BroadcastNestedLoopJoin with a bounded 1-row/
      // constant side, e.g. q_tfidf's corpus-count factor, is fine and
      // deliberately not flagged.) AQE (on by default) roots the plan at
      // an AdaptiveSparkPlanExec whose inner plan `collectWithSubqueries`
      // does NOT traverse, so the sweep must unwrap it explicitly —
      // without this the check silently passes every query with an
      // exchange in its plan.
      if (hasCartesian(df.queryExecution.executedPlan)) cartesianOffenders += name
      spark.catalog.clearCache()
    }
    val shapes = shapeOffenders.result()
    val carts = cartesianOffenders.result()
    assert(shapes.isEmpty,
      "comparator-incompatible output columns (stringify per the " +
        s"q_array_agg convention): ${shapes.mkString("; ")}")
    assert(carts.isEmpty,
      s"queries planning a CartesianProduct: ${carts.mkString(", ")}")
  }
}
