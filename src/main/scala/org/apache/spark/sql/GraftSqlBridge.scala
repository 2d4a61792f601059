package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; a
  * library shipping custom Catalyst expressions needs exactly these two
  * conversions to expose them as `Column`s, so we surface them from
  * inside the package — the standard extension-library technique (no
  * Spark internals are modified). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an analyzed logical plan back into a DataFrame (Spark 4 hides
    * `Dataset.ofRows` behind `private[sql]`). Needed to hand custom
    * logical operators (e.g. graft.plans.TopKPerGroup) to the planner. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
