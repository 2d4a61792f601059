package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Randomized differential for the bucketed tolerance join: random
  * double values (exactly-representable quarters, negatives included,
  * duplicates common) × random tolerances, with pairs planted exactly
  * AT the tolerance boundary and exactly ON bucket edges — the float
  * geometry where `floor(v / tol)` bucketing can silently drop or
  * duplicate a qualifying pair. Reference is the literal
  * `|x − y| ≤ tol` filter. */
class RangeJoinPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genCase = for {
    tol <- Gen.oneOf(0.25, 0.5, 1.0, 2.5, 7.0)
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 40)
    ls <- Gen.listOfN(nl, Gen.choose(-160, 160).map(_ / 4.0))
    rsBase <- Gen.listOfN(nr, Gen.choose(-160, 160).map(_ / 4.0))
    // plant boundary hits: right values exactly tol away from a left
    // value, and exactly on a bucket edge (a multiple of tol)
    planted <- Gen.listOfN(math.min(nl, 5), Gen.choose(0, math.max(nl - 1, 0)))
  } yield {
    val rs = rsBase ++
      planted.collect { case i if ls.nonEmpty => ls(i) + tol } ++
      planted.collect { case i if ls.nonEmpty =>
        math.floor(ls(i) / tol) * tol }
    (ls.zipWithIndex.map { case (v, i) => (i + 1L, v) },
      rs.zipWithIndex.map { case (v, i) => (100L + i, v) }, tol)
  }

  test("bucketed == literal |x - y| <= tol for random values and tolerances") {
    import spark.implicits._
    check(Prop.forAllNoShrink(genCase) { case (ls, rs, tol) =>
      val brute = (for {
        (il, vl) <- ls; (ir, vr) <- rs if math.abs(vl - vr) <= tol
      } yield (il, ir)).toSet
      val rows = RangeJoin.bucketed(
          ls.toDF("lid", "lv"), "lv", rs.toDF("rid", "rv"), "rv", tol)
        .select("lid", "rid").collect()
      val got = rows.map(r => (r.getLong(0), r.getLong(1)))
      got.toSet == brute && rows.length == brute.size
    }, 30)
  }
}
