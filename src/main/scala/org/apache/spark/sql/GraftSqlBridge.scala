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
}
