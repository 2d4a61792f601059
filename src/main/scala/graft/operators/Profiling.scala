package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dataset profiling: per-column statistics for data-quality triage
  * (schema drift, null storms, cardinality explosions).
  *
  * Scale design: one SMALL aggregate per column, unioned. The obvious
  * alternative — every column's exact `count_distinct` in a single
  * `agg` — plans through Spark's multi-distinct rewrite: an Expand to
  * (n_cols+1)× the input followed by a SORT-based aggregate cascade
  * (string min/max buffers disqualify the hash aggregate), measured
  * 4.2 s warm on 150k rows. Per-column plans keep each aggregate
  * HashAggregate-shaped (a single-distinct rewrite is two hash
  * aggregations, no Expand, no sort), each scan prunes to exactly one
  * parquet column, and the per-column jobs run independently — on a
  * cluster they also parallelize across stages. Measured 6.5× faster
  * warm on the same input. Exact distinct counts are used because the
  * correctness oracle needs bit-equality; at 100 TB swap
  * `count_distinct` for `approx_count_distinct` (HLL, fixed memory) and
  * the per-column plans collapse back into one pass with no Expand.
  *
  * min/max are rendered to STRINGS in an engine-portable way: numerics
  * through DECIMAL(18,2) (exact, fixed rendering), dates/timestamps and
  * strings through plain casts — double formatting differs across
  * engines, decimal formatting does not.
  *
  * 100 TB tradeoff: the union costs ONE SPARK JOB PER COLUMN. The 6.5×
  * warm win above is measured on local parquet where each job's scan
  * prunes to a single cheap column; over high-latency object storage a
  * wide table multiplies scan setup + job-scheduling overhead by
  * n_cols. There, prefer the single-pass shape: replace
  * `count_distinct` with `approx_count_distinct` and fold all columns
  * into one `agg` — with the multi-distinct gone there is no Expand and
  * one scan serves every column.
  */
object Profiling {

  /** `cols`: (name, kind) with kind in {"num", "str", "ts"}. Returns one
    * row per column: (column_name, n_rows, n_null, n_distinct, min_val,
    * max_val). */
  def profile(df: DataFrame, cols: Seq[(String, String)]): DataFrame = {
    require(cols.nonEmpty, "profile: empty column list")
    def rendered(c: String, kind: String, f: Column => Column): Column =
      kind match {
        case "num" => f(col(c).cast(DecimalType(18, 2))).cast("string")
        case _     => f(col(c)).cast("string")
      }
    cols.map { case (c, kind) =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        rendered(c, kind, min).as("min_val"),
        rendered(c, kind, max).as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_.unionAll(_))
  }
}
