package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `private[sql]` bridge: turn a hand-built LogicalPlan into a DataFrame.
  * Lives in the org.apache.spark.sql package solely to reach
  * `classic.Dataset.ofRows` — the standard pattern extension libraries use
  * to surface custom logical operators through the public Dataset API. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a hand-built Expression as a Column (and back). Internal
    * operator paths use this instead of temp-function registration:
    * registration is PER-SESSION (SparkSession.active can be the wrong
    * session in multi-session apps), while a directly-constructed
    * expression is session-independent by nature. The Registry-based
    * names remain for SQL users. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
