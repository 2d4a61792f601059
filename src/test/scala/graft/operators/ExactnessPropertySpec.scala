package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Randomized exactness sweeps for the remaining integer-arithmetic
  * operators: the pigeonhole Hamming join under every legal block
  * geometry, and the scaled-BIGINT CUSUM algebra against a local
  * fold. */
class ExactnessPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("hammingPairsExact == all-pairs truth under random geometries") {
    import spark.implicits._
    val gen = for {
      // legal geometries only: bits a multiple of maxHamming+1
      (bits, maxH) <- Gen.oneOf((8, 1), (8, 3), (12, 1), (12, 2),
        (12, 3), (16, 1), (16, 3), (20, 4))
      n <- Gen.choose(0, 80)
      sigs <- Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1))
      // planted near-misses: flip up to maxH+1 random bits of a prior
      // signature so the boundary (exactly maxH vs maxH+1) is hit often
      flips <- Gen.listOfN(math.min(n, 10), for {
        base <- Gen.choose(0, math.max(n - 1, 0))
        k <- Gen.choose(1, maxH + 1)
        pos <- Gen.listOfN(k, Gen.choose(0, bits - 1))
      } yield (base, pos))
    } yield {
      val planted = flips.zipWithIndex.collect {
        case ((b, pos), i) if sigs.nonEmpty =>
          (1000L + i, pos.foldLeft(sigs(b))((s, p) => s ^ (1L << p)))
      }
      val all = sigs.zipWithIndex.map { case (s, i) => (i + 1L, s) } ++ planted
      (all, bits, maxH)
    }
    check(Prop.forAllNoShrink(gen) { case (all, bits, maxH) =>
      val brute = (for {
        (ia, sa) <- all; (ib, sb) <- all if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxH
      } yield (ia, ib, h.toLong)).toSet
      val got =
        if (all.isEmpty) Set.empty[(Long, Long, Long)]
        else Dedup.hammingPairsExact(all.toDF("id", "sig"),
            "id", "sig", bits, maxH)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got == brute
    }, 30)
  }

  test("cusumFromDaily == a local fold on random daily tables") {
    import spark.implicits._
    val gen = for {
      nKeys <- Gen.choose(1, 4)
      rows <- Gen.listOfN(nKeys * 8, for {
        k <- Gen.choose(0, nKeys - 1)
        day <- Gen.choose(0L, 14L)
        n <- Gen.choose(1L, 50L)
      } yield (s"k$k", day, n))
    } yield rows.groupBy(r => (r._1, r._2))
      .map { case ((k, d), vs) => (k, d, vs.map(_._3).sum) }.toSeq
    check(Prop.forAllNoShrink(gen) { daily =>
      val expect = daily.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.sortBy(_._2)
        val dd = sorted.size.toLong
        val total = sorted.map(_._3).sum
        val devs = sorted.zipWithIndex.map { case ((_, day, n), i) =>
          val cum = sorted.take(i + 1).map(_._3).sum
          (day, n, dd * cum - (i + 1L) * total)
        }
        val peak = devs.map(d => math.abs(d._3)).max
        devs.map { case (day, n, dev) =>
          (k, day, n, dev, math.abs(dev) == peak) }
      }.toSet
      val got = Events.cusumFromDaily(
          daily.toDF("event_type", "day", "n"), "event_type")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
      got == expect
    }, 30)
  }
}
