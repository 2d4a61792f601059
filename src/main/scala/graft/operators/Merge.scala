package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert emulation for batch tables (the reference engine
  * is read-only — `database.py` has no DML — so this is pure extension
  * surface for a training-data pipeline: apply a day's corrections /
  * additions to a snapshot).
  *
  * Scale design: ONE shuffle — a full outer join on the key. Both sides
  * hash-partition on the key, so at 100 TB this is the same cost as any
  * key-join of snapshot × delta; with the snapshot bucketed on the key
  * at rest (see ScaleJoins) the big side doesn't shuffle at all. The
  * delta is usually small — Catalyst broadcast does not apply to full
  * outer joins, which is correct here: the result IS the new snapshot,
  * sized like the base.
  */
object Merge {

  /** Upsert `delta` into `base` on `key`: delta rows win wholesale for
    * matched keys, unmatched delta keys are inserted, unmatched base rows
    * pass through. A NULL in a non-key delta column inherits the base
    * value (partial-update semantics via per-column coalesce). Both
    * inputs must share the same schema. */
  def upsert(base: DataFrame, delta: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(delta.columns),
      s"upsert requires identical schemas, got " +
        s"${base.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
    val cols = base.columns
    base.as("b")
      .join(delta.as("d"), col(s"b.$key") === col(s"d.$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"d.$c"), col(s"b.$c")).as(c)).toSeq: _*)
  }
}
