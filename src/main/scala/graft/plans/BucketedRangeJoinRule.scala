package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DoubleType, LongType}

/** Optimizer rule: plans a tolerance range join between two LARGE tables
  * as a bucketed EQUI join instead of a nested loop.
  *
  * Spark's planner turns `a JOIN b ON abs(a.v - b.v) <= tol` into a
  * BroadcastNestedLoopJoin (or a cartesian product once both sides
  * outgrow the broadcast threshold) — O(n×m) comparisons, the classic
  * 100-TB scale-killer. This rule rewrites the logical join to the
  * `RangeJoin.bucketed` shape automatically: bucket both sides by
  * `floor(v / tol)`, replicate the right side into its 3 neighbor
  * buckets (constant blow-up), equi-join on the bucket id, and keep the
  * original predicate as the exact residual filter inside the join
  * condition. Any qualifying pair lands in the same or an adjacent
  * bucket (|l−r| <= tol bounds floor(l/tol) to floor(r/tol) ± 1), so
  * results are identical — including NULL/NaN rows, which fail the
  * residual predicate in both plans (RangeJoinSpec proves equivalence).
  *
  * Scope: inner joins whose ENTIRE condition is `abs(x - y) <= tol`
  * (either comparison orientation) with a positive numeric literal
  * tolerance and one side of the subtraction from each input. Joins
  * with additional equi keys already avoid the nested loop, so they are
  * left alone. Injected via [[graft.functions.GraftExtensions]];
  * `spark.experimental.extraOptimizations` works too.
  */
object BucketedRangeJoinRule extends Rule[LogicalPlan] {

  private def tolOf(l: Literal): Option[Double] = l.value match {
    case d: java.lang.Double => Option.when(d > 0)(d.doubleValue)
    case f: java.lang.Float => Option.when(f > 0)(f.doubleValue)
    case i: java.lang.Integer => Option.when(i > 0)(i.doubleValue)
    case j: java.lang.Long => Option.when(j > 0)(j.doubleValue)
    case s: java.lang.Short => Option.when(s > 0)(s.doubleValue)
    case d: Decimal => Option.when(d.toDouble > 0)(d.toDouble)
    case _ => None
  }

  /** A column reference, possibly under the numeric widening cast the
    * analyzer inserts for mixed-type comparisons (int vs double etc.).
    * Bucketing on the bare attribute is equivalent: the bucket formula
    * re-casts to double itself, and numeric widening is exact. */
  private object BareAttr {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: Cast if c.dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType] =>
        c.child match {
          case a: AttributeReference => Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  /** `abs(a - b) <= tol` in either orientation. */
  private def matchRange(cond: Expression)
      : Option[(AttributeReference, AttributeReference, Double)] =
    cond match {
      case LessThanOrEqual(
            Abs(Subtract(BareAttr(a), BareAttr(b), _), _),
            l: Literal) =>
        tolOf(l).map((a, b, _))
      case GreaterThanOrEqual(l: Literal,
            Abs(Subtract(BareAttr(a), BareAttr(b), _), _)) =>
        tolOf(l).map((a, b, _))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      matchRange(cond).flatMap { case (a, b, tol) =>
        if (left.outputSet.contains(a) && right.outputSet.contains(b))
          Some(rewrite(j, a, b, tol, cond))
        else if (left.outputSet.contains(b) && right.outputSet.contains(a))
          Some(rewrite(j, b, a, tol, cond))
        else None
      }.getOrElse(j)
  }

  private def bucket(v: Expression, tol: Double): Expression =
    Floor(Divide(Cast(v, DoubleType), Literal(tol)))

  private def rewrite(j: Join, lv: AttributeReference,
      rv: AttributeReference, tol: Double, orig: Expression): LogicalPlan = {
    val lb = Alias(bucket(lv, tol), "__graft_bucket")()
    val newLeft = Project(j.left.output :+ lb, j.left)
    val rb = bucket(rv, tol)
    val neighbors = CreateArray(Seq(
      Subtract(rb, Literal(1L)), rb, Add(rb, Literal(1L))))
    val genAttr = AttributeReference("__graft_bucket_r", LongType)()
    val newRight = Generate(Explode(neighbors),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(genAttr), child = j.right)
    // equi key first so ExtractEquiJoinKeys plans a hash/sort-merge join;
    // the original range predicate rides along as the residual condition
    val newCond = And(EqualTo(lb.toAttribute, genAttr), orig)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
