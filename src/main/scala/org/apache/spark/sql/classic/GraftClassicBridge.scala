package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expands lazily-wrapped column nodes (SqlExpression et al.) into
  * their real catalyst trees using Spark's own converter. Lives in the
  * `classic` package because ColumnNodeExpression is private[classic];
  * see GraftSqlBridge.parsedExpression for the public face. */
private[sql] object GraftClassicBridge {
  def expand(e: Expression): Expression = e.transformUp {
    case cne: ColumnNodeExpression =>
      ColumnNodeToExpressionConverter(cne.node)
  }
}
