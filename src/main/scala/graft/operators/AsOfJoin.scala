package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with the same
  * key whose time is <= the left row's time (inner form: unmatched left
  * rows drop).
  *
  * Spark has no built-in as-of join; the scalable formulation is the
  * classic tagged-union merge: union both sides ordered by (time, side),
  * then a running `last(right_ref, ignoreNulls)` window carries the most
  * recent right ref forward into each left row. Cost: ONE shuffle on the
  * key + a per-key sort — same asymptotics as a sort-merge join, no
  * range-condition nested loop (a naive `left.t >= right.t` join is a
  * BroadcastNestedLoop that explodes quadratically per key).
  *
  * Right rows are pre-deduped to one ref per (key, time) — MAX(ref) — so
  * ties are deterministic. At equal times the right row sorts BEFORE the
  * left row (side desc), giving `left.t >= right.t` (inclusive) semantics,
  * matching e.g. DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** @param left     probe side (e.g. events)
    * @param right    reference side (e.g. orders)
    * @param toleranceMicros if set, matches farther than this from the
    *                 probe time are dropped (same semantics as pandas
    *                 merge_asof tolerance: match the nearest first, THEN
    *                 apply the distance cut)
    * @return left ids with their matched right ref:
    *         (leftId, key, matchedRef) */
  def asOf(left: DataFrame, leftKey: String, leftTime: String, leftId: String,
      right: DataFrame, rightKey: String, rightTime: String, rightRef: String,
      toleranceMicros: Option[Long] = None): DataFrame = {
    val r = right.groupBy(col(rightKey).as("k"), col(rightTime).as("t"))
      .agg(max(col(rightRef)).as("ref"))
      .select(col("k"), col("t"), lit(1).as("side"), col("ref"),
        lit(null).cast("long").as("lid"))
    val l = left.select(col(leftKey).as("k"), col(leftTime).as("t"),
      lit(0).as("side"), lit(null).cast("long").as("ref"),
      col(leftId).as("lid"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = r.unionAll(l)
      .withColumn("match_ref",
        last(when(col("side") === 1, col("ref")), ignoreNulls = true).over(w))
      .withColumn("match_t",
        last(when(col("side") === 1, col("t")), ignoreNulls = true).over(w))
      .filter(col("side") === 0 && col("match_ref").isNotNull)
    val cut = toleranceMicros match {
      case Some(tol) => merged.filter(col("t") - col("match_t") <= tol)
      case None => merged
    }
    cut.select(col("lid").as(leftId), col("k").as(leftKey),
      col("match_ref").as(rightRef))
  }

  /** As-of join carrying the matched right row's PAYLOAD columns, not
    * just a ref: the right side packs (ref, payload…) into one struct —
    * struct ordering is lexicographic and ref (unique) leads, so MAX
    * deterministically picks the max-ref row's payload per (key, time) —
    * and the running window carries the whole struct forward, unpacked at
    * the end. Same one-shuffle cost as [[asOf]]. */
  def asOfPayload(left: DataFrame, leftKey: String, leftTime: String,
      leftId: String, right: DataFrame, rightKey: String, rightTime: String,
      rightRef: String, payloadCols: Seq[String]): DataFrame = {
    val pay = struct((col(rightRef) +: payloadCols.map(col)): _*)
    val r = right.groupBy(col(rightKey).as("k"), col(rightTime).as("t"))
      .agg(max(pay).as("pay"))
      .select(col("k"), col("t"), lit(1).as("side"), col("pay"),
        lit(null).cast("long").as("lid"))
    val l = left.select(col(leftKey).as("k"), col(leftTime).as("t"),
      lit(0).as("side"), lit(null).cast(r.schema("pay").dataType).as("pay"),
      col(leftId).as("lid"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionAll(l)
      .withColumn("match_pay",
        last(when(col("side") === 1, col("pay")), ignoreNulls = true).over(w))
      .filter(col("side") === 0 && col("match_pay").isNotNull)
      .select((Seq(col("lid").as(leftId), col("k").as(leftKey),
        col(s"match_pay.$rightRef").as(rightRef)) ++
        payloadCols.map(c => col(s"match_pay.$c").as(c))): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key at or after the left time. Implemented as the backward
    * join on negated times — ordering reverses, semantics flip, and the
    * machinery (one shuffle + per-key sort) is shared. */
  def asOfForward(left: DataFrame, leftKey: String, leftTime: String,
      leftId: String, right: DataFrame, rightKey: String, rightTime: String,
      rightRef: String, toleranceMicros: Option[Long] = None): DataFrame =
    asOf(
      left.withColumn("_neg_t", -col(leftTime)), leftKey, "_neg_t", leftId,
      right.withColumn("_neg_t", -col(rightTime)), rightKey, "_neg_t",
      rightRef, toleranceMicros)
}
