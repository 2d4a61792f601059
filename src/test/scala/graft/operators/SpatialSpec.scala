package graft.operators

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.functions._

/** Grid-bucketed radius join: differential vs the naive all-pairs
  * truth (including negative coordinates, where floor-vs-truncate
  * division bugs live), exactly-once pair emission, and the guards. */
class SpatialSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  private def run(pts: Seq[(Long, Long, Long)], r: Long, cell: Long) = {
    import spark.implicits._
    Spatial.radiusJoin(pts.toDF("id", "x", "y"), "id", "x", "y", r, cell)
      .collect().map(t => (t.getLong(0), t.getLong(1), t.getLong(2)))
      .toSet
  }

  test("radiusJoin equals the naive all-pairs join, negatives included") {
    // deterministic pseudo-random points straddling the origin so cell
    // ids go negative: a truncating division would fold cells -1 and 0
    // together and DUPLICATE or MISS cross-origin pairs
    val pts = (1L to 400L).map(i =>
      (i, (i * 37 % 211) - 105, (i * 91 % 223) - 111))
    for ((r, cell) <- Seq((10L, 10L), (10L, 25L), (25L, 40L), (1L, 50L)))
      assert(run(pts, r, cell) == brute(pts, r),
        s"divergence at radius=$r cell=$cell")
  }

  test("pairs on exact cell boundaries emit exactly once") {
    // coincident and boundary-straddling points: equal coordinates,
    // points exactly on multiples of the cell size, zero distances
    val pts = Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 50L, 50L),
      (4L, 49L, 49L), (5L, 50L, 0L), (6L, 100L, 100L))
    val got = run(pts, 50L, 50L)
    assert(got == brute(pts, 50L))
    // multiset check: collect WITHOUT the set-dedupe — each pair once
    import spark.implicits._
    val rows = Spatial.radiusJoin(pts.toDF("id", "x", "y"),
      "id", "x", "y", 50L, 50L).collect()
    assert(rows.length == got.size, "a pair was emitted more than once")
  }

  test("guards: radius must not exceed cell; cell must be positive") {
    import spark.implicits._
    val df = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", 51L, 50L))
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", 1L, 0L))
    intercept[IllegalArgumentException](
      Spatial.density(df, "x", "y", 0L, 1L))
  }

  test("density counts per cell with floor semantics across the origin") {
    import spark.implicits._
    val pts = Seq((-1L, -1L), (-50L, -50L), (0L, 0L), (49L, 49L), (1L, 1L))
      .toDF("x", "y")
    val cells = Spatial.density(pts, "x", "y", 50L, 3L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getBoolean(3)))).toMap
    // -1 and -50 live in cell -1, NOT cell 0 (floor, not truncate)
    assert(cells(( -1L, -1L)) == ((2L, false)))
    assert(cells((0L, 0L)) == ((3L, true)))
  }
}
