package graft.operators

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.functions._

/** CUSUM changepoint arithmetic on a hand-built series and the
  * edit-distance dedup verify (thresholded levenshtein semantics,
  * differential vs a local DP over the operator's own candidates). */
class ChangepointEditSpec extends SparkSpec {

  test("cusumDaily finds the level shift; dev_fx is the exact scaled sum") {
    import spark.implicits._
    // key A: 5 days of counts 1,1,1,5,5 (shift after day 3); the ts for
    // day d, event j is (d days + j seconds) in NANOS (the normalized
    // events encoding cusumDaily expects)
    val counts = Seq(1, 1, 1, 5, 5)
    val rows = for {
      (c, d) <- counts.zipWithIndex; j <- 1 to c
    } yield (d.toLong * 86400000000000L + j * 1000000000L, "A")
    val got = Events.cusumDaily(rows.toDF("ts", "event_type"), "event_type")
      .orderBy("day").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // total=13, D=5; dev_fx(idx) = 5*cum - idx*13
    val expect = Seq(
      (0L, 1L, 5L * 1 - 1 * 13L, false),   // -8
      (1L, 1L, 5L * 2 - 2 * 13L, false),   // -16
      (2L, 1L, 5L * 3 - 3 * 13L, true),    // -24: the changepoint
      (3L, 5L, 5L * 8 - 4 * 13L, false),   // -12
      (4L, 5L, 5L * 13 - 5 * 13L, false))  // 0
    assert(got.toSeq == expect)
  }

  test("cusumDaily keys are independent; ties flag every argmax") {
    import spark.implicits._
    // key B is perfectly flat: dev_fx = 0 every day, so EVERY day ties
    // as the peak (output stays a pure function of the data)
    val rows = (0 to 2).map(d =>
      (d.toLong * 86400000000000L + 1000000000L, "B"))
    val got = Events.cusumDaily(rows.toDF("ts", "event_type"), "event_type")
      .collect().map(r => (r.getLong(3), r.getBoolean(4)))
    assert(got.forall(_ == ((0L, true))))
  }

  test("hammingPairsExact equals all-pairs truth for any block geometry") {
    import spark.implicits._
    // deterministic pseudo-random 16-bit signatures with planted
    // near-duplicates (one- and three-bit flips of earlier rows)
    val base = (1L to 120L).map(i => (i, (i * 2654435761L >>> 13) & 0xFFFFL))
    val planted = Seq(
      (201L, base(10)._2 ^ 1L),           // hamming 1 of id 11
      (202L, base(20)._2 ^ 0x8004L),      // hamming 2 of id 21
      (203L, base(30)._2 ^ 0x4210L))      // hamming 3 of id 31
    val sigs = base ++ planted
    for (maxH <- Seq(1, 3)) {
      val brute = (for {
        (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb)
        if h <= maxH
      } yield (ia, ib, h.toLong)).toSet
      val got = Dedup.hammingPairsExact(sigs.toDF("id", "sig"),
          "id", "sig", bits = 16, maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == brute, s"divergence at maxHamming=$maxH")
      assert(got.exists(_._1 == (if (maxH >= 1) 11L else -1L)) || maxH < 1)
    }
    // geometry guard: bits must split into maxHamming+1 equal blocks
    intercept[IllegalArgumentException](
      Dedup.hammingPairsExact(sigs.toDF("id", "sig"), "id", "sig", 16, 2))
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs = candidates filtered by a local DP; -1 never leaks") {
    import spark.implicits._
    // word-salad docs: 2 appends one token to 1 (tiny suffix edit, near
    // certain band collision at jaccard 28/29), 3 is a heavily patched
    // 1 (candidate-close but beyond the threshold), 4 is unrelated
    val base = (1 to 30).map(i => s"tok${i % 7}").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " tail"),
      (3L, base.split(" ").map(w => if (w == "tok1") "yyyyyyyy" else w)
        .mkString(" ")),
      (4L, (1 to 30).map(i => s"zz${i}").mkString(" ")))
      .toDF("doc_id", "text")
    val maxDist = 10
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val texts = Map(docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)): _*)
    val expect = cand.map { case (a, b) =>
      (a, b, lev(texts(a), texts(b)).toLong) }
      .filter(_._3 <= maxDist)
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.forall(_._3 >= 0), "thresholded levenshtein's -1 leaked")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L),
      "the one-token patch pair must verify")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L),
      "the heavy patch must exceed the threshold")
  }
}
