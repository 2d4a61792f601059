package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Randomized differential for the as-of family: random event tables
  * with heavy timestamp TIES (same key+time on both sides, left times
  * landing exactly on right times), random tolerance windows, and the
  * forward variant — against a literal per-row local scan of the
  * definition. Boundary semantics (at-or-before includes equality;
  * tolerance is inclusive; ties pick max ref) are where as-of joins
  * break, and dense random collisions hit them constantly. */
class AsOfPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // tiny key/time domains → dense collisions on every boundary
  private val genCase = for {
    nl <- Gen.choose(0, 25)
    nr <- Gen.choose(0, 25)
    lefts <- Gen.listOfN(nl, Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(0L, 20L)))
    rights <- Gen.listOfN(nr, Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(0L, 20L)))
    tol <- Gen.oneOf(None, Some(0L), Some(3L), Some(100L))
  } yield (
    lefts.zipWithIndex.map { case ((k, t), i) => (i + 1L, k, t) },
    rights.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) },
    tol)

  private def localAsOf(lefts: Seq[(Long, Long, Long)],
      rights: Seq[(Long, Long, Long)], tol: Option[Long],
      forward: Boolean): Set[(Long, Long, Long)] =
    lefts.flatMap { case (lid, k, t) =>
      val cands = rights.filter(r => r._1 == k &&
        (if (forward) r._2 >= t else r._2 <= t) &&
        tol.forall(w => math.abs(r._2 - t) <= w))
      if (cands.isEmpty) None
      else {
        // nearest time wins; among same-time rows the max ref wins
        val bestT =
          if (forward) cands.map(_._2).min else cands.map(_._2).max
        Some((lid, k, cands.filter(_._2 == bestT).map(_._3).max))
      }
    }.toSet

  test("asOf backward/forward/tolerance == the literal definition") {
    import spark.implicits._
    check(Prop.forAllNoShrink(genCase) { case (lefts, rights, tol) =>
      val l = lefts.toDF("lid", "k", "t")
      val r = rights.toDF("k", "t", "ref")
      def run(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      val backOk = run(AsOfJoin.asOf(l, "k", "t", "lid",
        r, "k", "t", "ref", tol)) ==
        localAsOf(lefts, rights, tol, forward = false)
      val fwdOk = run(AsOfJoin.asOfForward(l, "k", "t", "lid",
        r, "k", "t", "ref", tol)) ==
        localAsOf(lefts, rights, tol, forward = true)
      backOk && fwdOk
    }, 30)
  }
}
