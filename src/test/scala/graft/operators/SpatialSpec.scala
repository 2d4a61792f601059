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
    // cases straddle both regimes: radius below the cell size (3x3
    // neighborhood) and radius ABOVE it (wider (2R+1)^2 ring)
    for ((r, cell) <- Seq((10L, 10L), (10L, 25L), (25L, 40L), (1L, 50L),
      (60L, 25L), (37L, 10L)))
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

  test("guards: cell must be positive, radius non-negative") {
    import spark.implicits._
    val df = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", 1L, 0L))
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(df, "id", "x", "y", -1L, 50L))
    intercept[IllegalArgumentException](
      Spatial.density(df, "x", "y", 0L, 1L))
  }

  test("radiusJoinWith (bipartite) equals the naive cross filter") {
    import spark.implicits._
    val l = (1L to 200L).map(i => (i, (i * 37 % 211) - 105, (i * 91 % 223) - 111))
    val r = (1L to 60L).map(i => (i, (i * 53 % 199) - 99, (i * 17 % 191) - 95))
    for ((rad, cell) <- Seq((15L, 20L), (40L, 20L))) {
      val brute = (for {
        (il, xl, yl) <- l; (ir, xr, yr) <- r
        d2 = (xl - xr) * (xl - xr) + (yl - yr) * (yl - yr)
        if d2 <= rad * rad
      } yield (il, ir, d2)).toSet
      val rows = Spatial.radiusJoinWith(
          l.toDF("id", "x", "y"), "id", "x", "y",
          r.toDF("id", "x", "y"), "id", "x", "y", rad, cell)
        .collect()
      val got = rows.map(t => (t.getLong(0), t.getLong(1), t.getLong(2)))
      assert(got.toSet == brute, s"divergence at radius=$rad cell=$cell")
      assert(rows.length == brute.size, "a pair was emitted more than once")
    }
  }

  test("nearestWithin returns the bipartite argmin within the radius") {
    import spark.implicits._
    val l = (1L to 150L).map(i => (i, (i * 37 % 211) - 105, (i * 91 % 223) - 111))
    val r = (1L to 40L).map(i => (i, (i * 53 % 199) - 99, (i * 17 % 191) - 95))
    val rad = 30L
    val brute = (for {
      (il, xl, yl) <- l
      cands = r.map { case (ir, xr, yr) =>
        (ir, (xl - xr) * (xl - xr) + (yl - yr) * (yl - yr)) }
        .filter(_._2 <= rad * rad)
      if cands.nonEmpty
      (ir, d2) = cands.minBy(t => (t._2, t._1))
    } yield (il, ir, d2, 1L)).toSet
    val got = Spatial.nearestWithin(
        l.toDF("id", "x", "y"), "id", "x", "y",
        r.toDF("id", "x", "y"), "id", "x", "y", rad, 25L, 1)
      .collect()
      .map(t => (t.getLong(0), t.getLong(1), t.getLong(2), t.getLong(3)))
      .toSet
    assert(got == brute)
  }

  test("knnWithin equals rank-over-brute-force, capped at k") {
    import spark.implicits._
    val pts = (1L to 300L).map(i =>
      (i, (i * 37 % 211) - 105, (i * 91 % 223) - 111))
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia != ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 20L * 20L
    } yield (ia, ib, d2))
      .groupBy(_._1).toSeq.flatMap { case (_, nbrs) =>
        nbrs.sortBy(t => (t._3, t._2)).take(3)
          .zipWithIndex.map { case ((a, b, d), i) => (a, b, d, i + 1L) }
      }.toSet
    val got = Spatial.knnWithin(pts.toDF("id", "x", "y"),
        "id", "x", "y", 20L, 25L, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == brute)
  }

  test("dbscan equals a local reference implementation") {
    import spark.implicits._
    val pts = (1L to 300L).map(i =>
      (i, (i * 37 % 211) - 105, (i * 91 % 223) - 111))
    val (eps, minPts) = (15L, 4)
    // local reference: eps-graph, cores, union-find over core edges,
    // min-label borders, -1 noise
    val nbrs = pts.map { case (i, xi, yi) =>
      i -> pts.filter { case (j, xj, yj) =>
        j != i &&
          (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps
      }.map(_._1).toSet
    }.toMap
    val core = pts.map(_._1).filter(i => nbrs(i).size + 1 >= minPts).toSet
    val parent = scala.collection.mutable.Map(core.map(i => i -> i).toSeq: _*)
    def find(i: Long): Long =
      if (parent(i) == i) i else { val r = find(parent(i)); parent(i) = r; r }
    for (i <- core; j <- nbrs(i) if core(j)) {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val label = core.map(i => i -> find(i)).toMap
    val expect = pts.map(_._1).map { i =>
      if (core(i)) (i, "core", label(i))
      else {
        val cn = nbrs(i).filter(core)
        if (cn.nonEmpty) (i, "border", cn.map(label).min)
        else (i, "noise", -1L)
      }
    }.toSet
    val got = Spatial.dbscan(pts.toDF("id", "x", "y"),
        "id", "x", "y", eps, minPts.toLong)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expect)
    // sanity: this parameterization exercises all three roles
    assert(expect.exists(_._2 == "core") && expect.exists(_._2 == "border")
      && expect.exists(_._2 == "noise"))
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
