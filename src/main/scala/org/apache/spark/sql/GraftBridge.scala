package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters so graft
  * can expose native Catalyst expressions as user-facing Columns
  * (the supported extension-point pattern; Spark 4 moved the classic
  * converters behind `org.apache.spark.sql.classic`). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame over a hand-built logical plan (graft's custom
    * operator nodes, e.g. `plans.PointIntervalJoin`). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
