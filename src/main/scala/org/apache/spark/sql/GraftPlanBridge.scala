package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` bridge: turn a hand-built LogicalPlan into a DataFrame.
  * Lives in the org.apache.spark.sql package solely to reach
  * `classic.Dataset.ofRows` — the standard pattern extension libraries use
  * to surface custom logical operators through the public Dataset API. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
