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

  /** Drain the listener bus so a test reading job metrics through a
    * `SparkListener` sees every event of the jobs it just ran
    * (`listenerBus` is `private[spark]` — same surfacing technique as
    * the expression bridge above). */
  def flushListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Like [[expression]], but with every lazily-wrapped column node
    * (e.g. the SqlExpression that `functions.expr(...)` defers parsing
    * of) EXPANDED into its real catalyst tree via Spark's own
    * ColumnNode converter, and operator-named UnresolvedFunctions (the
    * shape programmatic `col("x") > lit(5)` converts to pre-analysis)
    * folded into their catalyst comparison/logical nodes — the form a
    * structural walk (pattern matching on And/comparison/Literal) can
    * actually see. Purely an unresolved-tree rewrite: nothing is
    * analyzed or bound. */
  def parsedExpression(c: Column): Expression = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions._
    classic.GraftClassicBridge.expand(expression(c)).transformUp {
      case uf: UnresolvedFunction if uf.nameParts.length == 1 &&
          !uf.isDistinct && uf.filter.isEmpty =>
        (uf.nameParts.head.toLowerCase(java.util.Locale.ROOT),
          uf.arguments) match {
          case (">", Seq(a, b)) => GreaterThan(a, b)
          case ("<", Seq(a, b)) => LessThan(a, b)
          case (">=", Seq(a, b)) => GreaterThanOrEqual(a, b)
          case ("<=", Seq(a, b)) => LessThanOrEqual(a, b)
          case ("=" | "==", Seq(a, b)) => EqualTo(a, b)
          case ("<=>", Seq(a, b)) => EqualNullSafe(a, b)
          case ("and", Seq(a, b)) => And(a, b)
          case ("or", Seq(a, b)) => Or(a, b)
          case ("!" | "not", Seq(a)) => Not(a)
          case ("isnull", Seq(a)) => IsNull(a)
          case ("isnotnull", Seq(a)) => IsNotNull(a)
          case ("in", a +: rest) => In(a, rest)
          case _ => uf
        }
    }
  }

  /** Wrap an analyzed logical plan back into a DataFrame (Spark 4 hides
    * `Dataset.ofRows` behind `private[sql]`). Needed to hand custom
    * logical operators (e.g. graft.plans.TopKPerGroup) to the planner. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The bare value column under a sort Column: unwraps BOTH sort
    * spellings — the ColumnNode-level SortOrder that `col.asc`/`.desc`
    * build, and a catalyst SortOrder wrapped via [[column]]. Non-sort
    * columns pass through. Needed wherever a sort key must ALSO be
    * evaluated as a value (e.g. distinct-key counting in
    * graft.plans.ParallelRank) — a raw SortOrder is Unevaluable. */
  def sortChild(c: Column): Column = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder => new Column(so.child)
    case e: classic.ExpressionColumnNode => e.expression match {
      case so: org.apache.spark.sql.catalyst.expressions.SortOrder =>
        column(so.child)
      case _ => c
    }
    case _ => c
  }

  /** Full sort spec of a sort Column: (bare value column, ascending?,
    * nulls first?). A plain non-sort column gets Spark's `orderBy`
    * default, ascending nulls-first. Both sort spellings of
    * [[sortChild]] are handled. Needed where a caller must REBUILD the
    * ordering against a different frame (e.g. the cutpoint sample sort
    * in graft.plans.ParallelRank.rankFamily). */
  def sortSpec(c: Column): (Column, Boolean, Boolean) = {
    import org.apache.spark.sql.internal.{SortOrder => NodeSO}
    import org.apache.spark.sql.catalyst.expressions.{
      SortOrder => CatSO, Ascending, NullsFirst}
    c.node match {
      case so: NodeSO =>
        (new Column(so.child), so.sortDirection == NodeSO.Ascending,
          so.nullOrdering == NodeSO.NullsFirst)
      case e: classic.ExpressionColumnNode => e.expression match {
        case so: CatSO =>
          (column(so.child), so.direction == Ascending,
            so.nullOrdering == NullsFirst)
        case _ => (c, true, true)
      }
      case _ => (c, true, true)
    }
  }
}
