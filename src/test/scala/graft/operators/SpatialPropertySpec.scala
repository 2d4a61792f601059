package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Randomized differential check of the spatial grid operators: for
  * random point clouds (clustered + uniform + coincident, straddling
  * the origin), random radius/cell geometry on BOTH sides of
  * radius = cell, and random DBSCAN parameters, every operator must
  * equal its naive quadratic reference exactly. The fixed-seed
  * differentials in SpatialSpec pin known edge classes; this spec
  * hunts for geometry combinations nobody thought to pin. */
class SpatialPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // point clouds: a few dense clusters plus uniform noise, coordinates
  // straddling the origin so negative-cell arithmetic stays exercised
  private val genPts: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    centers <- Gen.listOfN(3, Gen.zip(
      Gen.choose(-80L, 80L), Gen.choose(-80L, 80L)))
    pts <- Gen.listOfN(n, for {
      cl <- Gen.choose(0, 3) // 3 = uniform noise
      xy <-
        if (cl == 3) Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-100L, 100L))
        else Gen.zip(Gen.choose(-12L, 12L), Gen.choose(-12L, 12L)).map {
          case (dx, dy) =>
            (centers(cl)._1 + dx, centers(cl)._2 + dy)
        }
    } yield xy)
  } yield pts.zipWithIndex.map { case ((x, y), i) => (i + 1L, x, y) }

  test("radiusJoin == naive all-pairs for random clouds and geometry") {
    import spark.implicits._
    val gen = for {
      pts <- genPts
      r <- Gen.choose(0L, 40L)
      cell <- Gen.choose(1L, 50L)
    } yield (pts, r, cell)
    check(Prop.forAllNoShrink(gen) { case (pts, r, cell) =>
      val brute = (for {
        (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        if d2 <= r * r
      } yield (ia, ib, d2)).toSet
      val rows = Spatial.radiusJoin(pts.toDF("id", "x", "y"),
        "id", "x", "y", r, cell).collect()
      val got = rows.map(t => (t.getLong(0), t.getLong(1), t.getLong(2)))
      got.toSet == brute && rows.length == brute.size
    }, 30)
  }

  test("dbscan == local reference for random clouds and parameters") {
    import spark.implicits._
    val gen = for {
      pts <- genPts if pts.nonEmpty
      eps <- Gen.choose(1L, 25L)
      minPts <- Gen.choose(1L, 6L)
    } yield (pts, eps, minPts)
    check(Prop.forAllNoShrink(gen) { case (pts, eps, minPts) =>
      val nbrs = pts.map { case (i, xi, yi) =>
        i -> pts.filter { case (j, xj, yj) =>
          j != i &&
            (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= eps * eps
        }.map(_._1).toSet
      }.toMap
      val core = pts.map(_._1).filter(i => nbrs(i).size + 1 >= minPts).toSet
      val parent =
        scala.collection.mutable.Map(core.map(i => i -> i).toSeq: _*)
      def find(i: Long): Long =
        if (parent(i) == i) i
        else { val r = find(parent(i)); parent(i) = r; r }
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
          "id", "x", "y", eps, minPts)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      got == expect
    }, 20)
  }
}
