package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

/** Bridge into the `private[sql]` Dataset constructor so graft can build a
  * DataFrame from a custom LogicalPlan ([[graft.plans.AsOfJoinNode]]).
  * Standard extension-library technique: Spark offers no public API to wrap
  * a LogicalPlan, yet every planner-extension hook hands plans around. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
