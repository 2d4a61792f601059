package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial operators over planar (x, y) point sets — radius
  * self-join and density hotspots via GRID BUCKETING, the standard
  * distributed spatial shape (the same cell-join pattern PostGIS
  * tiling, GeoSpark/Sedona partitioning, and Uber's H3 pipelines use;
  * here on a square grid so every step is exact integer arithmetic).
  *
  * Scale design: a radius join is quadratic done naively. Assign each
  * point to a ⌈cell⌉-sized grid square; any pair within radius r ≤
  * cell lies in the same or an adjacent square, so candidates = the
  * 3×3 neighborhood join — ONE equi-shuffle on the cell key with a
  * constant ×9 probe-side fan-out (the explode ships 16-byte cell
  * keys, not payloads), then an exact distance verify on the
  * candidates. Cost is Σ|cell|·|neighborhood|, linear for any
  * bounded-density point set at any corpus size; a viral cell (every
  * point in one square) is the caller's cell-size bug, surfaced by
  * [[density]]'s hotspot readout rather than silently absorbed.
  *
  * Determinism: coordinates are whole-number doubles in the test
  * corpus and distances compare in exact BIGINT squared units — no
  * trig, no roots, so Spark and DuckDB agree bit-for-bit (haversine
  * would drift across libm implementations; planar-squared is the
  * oracle-safe core and the cell machinery is identical either way).
  */
object Spatial {

  /** All unordered pairs (id_a < id_b) within `radius`, by squared
    * Euclidean distance on integer-valued coordinates. Returns
    * (id_a, id_b, dist2: BIGINT). Requires radius ≤ cell — the 3×3
    * neighborhood is only exhaustive when a pair cannot span two whole
    * cells; callers with a larger radius raise `cell` (bigger cells =
    * fewer, fatter buckets), never the fan-out. */
  def radiusJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long, cell: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    require(radius <= cell,
      s"radius $radius exceeds cell $cell: a pair could span " +
        "non-adjacent cells and the 3x3 neighborhood would miss it")
    val pts = points.select(
      col(idCol).cast("long").as("pid"),
      col(xCol).cast("long").as("px"),
      col(yCol).cast("long").as("py"))
    val build = pts.select(col("pid").as("id_b"), col("px").as("bx"),
      col("py").as("by"),
      expr(s"floor(px / ${cell}L)").as("cx"),
      expr(s"floor(py / ${cell}L)").as("cy"))
    // probe side: each point visits its 9-cell neighborhood; the
    // exploded frame carries only (id, x, y, cell) — constant width
    val probe = pts
      .select(col("pid").as("id_a"), col("px").as("ax"),
        col("py").as("ay"),
        expr(s"floor(px / ${cell}L)").as("cx0"),
        expr(s"floor(py / ${cell}L)").as("cy0"))
      .withColumn("off", explode(expr(
        "array(-1L, 0L, 1L)")))
      .withColumn("off2", explode(expr("array(-1L, 0L, 1L)")))
      .select(col("id_a"), col("ax"), col("ay"),
        (col("cx0") + col("off")).as("cx"),
        (col("cy0") + col("off2")).as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("id_b"), col("dist2"))
  }

  /** Per-cell point density with a hotspot flag — the skew auditor for
    * [[radiusJoin]]'s cell-size choice (a cell holding k points costs
    * O(k²) verify work in its neighborhood) and a standalone spatial
    * aggregation. One hash aggregation; returns
    * (cx, cy, n, hotspot). */
  def density(points: DataFrame, xCol: String, yCol: String,
      cell: Long, hotspotAt: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    points.select(
        expr(s"floor(CAST($xCol AS LONG) / ${cell}L)").as("cx"),
        expr(s"floor(CAST($yCol AS LONG) / ${cell}L)").as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hotspot", col("n") >= lit(hotspotAt))
  }
}
