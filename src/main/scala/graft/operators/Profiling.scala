package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling: per-column statistics for data-quality triage
  * (schema drift, null storms, cardinality explosions) computed in ONE
  * scan of the table.
  *
  * Scale design: all columns' aggregates run in a single `agg` — one
  * pass, one partial/final aggregation, no per-column jobs — then the
  * wide 1-row result is unpivoted driver-free with `stack`. Exact
  * distinct counts are used here because the correctness oracle needs
  * bit-equality; at 100 TB swap `count_distinct` for
  * `approx_count_distinct` (HLL, fixed memory) — the plan shape is
  * otherwise unchanged, and the exact multi-distinct already relies on
  * Spark's Expand-based rewrite rather than per-column scans.
  *
  * min/max are rendered to STRINGS in an engine-portable way: numerics
  * through DECIMAL(18,2) (exact, fixed rendering), dates/timestamps and
  * strings through plain casts — double formatting differs across
  * engines, decimal formatting does not.
  */
object Profiling {

  /** `cols`: (name, kind) with kind in {"num", "str", "ts"}. Returns one
    * row per column: (column_name, n_rows, n_null, n_distinct, min_val,
    * max_val). */
  def profile(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    def rendered(c: String, kind: String, f: Column => Column): Column =
      kind match {
        case "num" => f(col(c).cast(DecimalType(18, 2))).cast("string")
        case _     => f(col(c)).cast("string")
      }
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (c, kind) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__nd"),
        rendered(c, kind, min).as(s"${c}__min"),
        rendered(c, kind, max).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { case (c, _) =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__min, ${c}__max"
    }.mkString(", ")
    wide.selectExpr("n_rows",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }
}
