package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Sequence packing: fixed-seed anatomy (oversized items, zero-weight
  * items, exact-fit boundaries) plus a randomized differential against
  * a local next-fit fold. */
class PackingSpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def localPack(items: Seq[(Long, Long)], cap: Long,
      splits: Int): Map[Long, (Long, Long)] =
    items.groupBy(i => ((i._1 % splits) + splits) % splits).flatMap {
      case (split, sp) =>
        var bin = 0L
        var used = 0L
        sp.sortBy(_._1).map { case (id, w) =>
          if (used > 0 && used + w > cap) { bin += 1; used = w }
          else used += w
          id -> ((split.toLong, split * 1000000L + bin))
        }
    }

  private def sparkPack(items: Seq[(Long, Long)], cap: Long,
      splits: Int): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val out = Packing.nextFit(items.toDF("id", "w"), "id", "w", cap, splits)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    Dedup.releaseAll(spark)
    out
  }

  test("anatomy: exact fits, oversized items, zero weights, single split") {
    // cap 10, everything in split 0 (ids % 5 == 0), fold order by id:
    // [4, 6] exactly fills bin 0; 25 is oversized and takes bin 1
    // alone; the 0-weight item arrives at used=25 > cap so it OPENS
    // bin 2 (pure next-fit: the cursor never looks back) at used 0;
    // then [7, 3] exactly fills that same bin 2.
    val items = Seq(1L -> 4L, 2L -> 6L, 3L -> 25L, 4L -> 0L,
      5L -> 7L, 6L -> 3L).map { case (i, w) => (i * 5L, w) }
    val got = sparkPack(items, cap = 10L, splits = 5)
    val want = localPack(items, 10L, 5)
    assert(got == want, s"got=$got want=$want")
    val bins = got.values.map(_._2).toSet
    assert(bins.size == 3, s"expected 3 bins, got $bins")
    assert(got(15L)._2 != got(5L)._2 && got(20L)._2 == got(25L)._2)
  }

  test("random items equal the local next-fit fold") {
    val gen = for {
      n <- Gen.choose(0, 60)
      items <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 500L)
        w <- Gen.choose(0L, 30L)
      } yield (id, w))
      cap <- Gen.choose(5L, 40L)
      splits <- Gen.choose(1, 6)
    } yield (items.distinctBy(_._1), cap, splits)
    check(Prop.forAllNoShrink(gen) { case (items, cap, splits) =>
      val got = sparkPack(items, cap, splits)
      val want = localPack(items, cap, splits)
      val ok = got == want
      if (!ok) println(s"FAIL cap=$cap splits=$splits items=$items\n got=$got\n want=$want")
      ok
    }, 30)
  }
}
