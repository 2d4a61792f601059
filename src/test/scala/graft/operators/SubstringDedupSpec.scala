package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Exact duplicated-substring detection: fixed-seed anatomy cases for
  * the known edge classes (overlapping maximal runs, multi-diagonal
  * repeats, short docs, full-doc twins, merged excise spans) plus a
  * randomized differential against a character-level brute force.
  * Tiny alphabet → dense accidental repeats, the adversarial regime
  * for diagonal run grouping. */
class SubstringDedupSpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Brute force: every (pair, pa, pb) whose L-grams match, extended
    * maximally along the diagonal — run starts are positions whose
    * predecessor pair does not match. */
  private def bruteRuns(docs: Seq[(Long, String)], minLen: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    def grams(t: String) =
      (1 to t.length - minLen + 1).map(i => i -> t.substring(i - 1, i - 1 + minLen))
    (for {
      (ida, ta) <- docs; (idb, tb) <- docs if ida < idb
      (pa, ga) <- grams(ta); (pb, gb) <- grams(tb) if ga == gb
      // run start: the predecessor gram pair must NOT match — given the
      // current grams match, that reduces to the preceding characters
      if pa == 1 || pb == 1 || ta(pa - 2) != tb(pb - 2)
    } yield {
      // char-wise maximal extension along the diagonal (equivalent to
      // consecutive-gram runs: overlapping grams share all but one char)
      var len = minLen
      while (pa - 1 + len < ta.length && pb - 1 + len < tb.length &&
        ta(pa - 1 + len) == tb(pb - 1 + len)) len += 1
      (ida, idb, pa.toLong, pb.toLong, len.toLong)
    }).toSet
  }

  /** Brute excise: cut every higher-id span (merged) out of its doc. */
  private def bruteExcise(docs: Seq[(Long, String)], minLen: Int)
      : Map[Long, (Long, String)] = {
    val spans = bruteRuns(docs, minLen).toSeq
      .map { case (_, db, _, sb, len) => db -> ((sb, sb + len)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val text = docs.toMap
    spans.map { case (id, sp) =>
      val t = text(id)
      var cur = 1L
      val acc = new StringBuilder
      sp.foreach { case (s, e) =>
        if (s > cur) acc.append(t.substring(cur.toInt - 1, s.toInt - 1))
        cur = math.max(cur, e)
      }
      if (cur <= t.length) acc.append(t.substring(cur.toInt - 1))
      id -> ((t.length.toLong, acc.toString))
    }
  }

  /** Bipartite brute force: same extension logic across two sides,
    * no id ordering (ids may even collide across sides). */
  private def bruteRunsWith(ls: Seq[(Long, String)],
      rs: Seq[(Long, String)], minLen: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    def grams(t: String) =
      (1 to t.length - minLen + 1).map(i => i -> t.substring(i - 1, i - 1 + minLen))
    (for {
      (ida, ta) <- ls; (idb, tb) <- rs
      (pa, ga) <- grams(ta); (pb, gb) <- grams(tb) if ga == gb
      if pa == 1 || pb == 1 || ta(pa - 2) != tb(pb - 2)
    } yield {
      var len = minLen
      while (pa - 1 + len < ta.length && pb - 1 + len < tb.length &&
        ta(pa - 1 + len) == tb(pb - 1 + len)) len += 1
      (ida, idb, pa.toLong, pb.toLong, len.toLong)
    }).toSet
  }

  private def runsOf(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long, Long, Long)] = {
    val out = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    Dedup.releaseAll(spark)
    out
  }

  test("anatomy: twins, shifted repeat, multi-diagonal, sub-threshold, short docs") {
    import spark.implicits._
    val docs = Seq(
      1L -> "xxxxABCDEFGHyyyy",      // shares ABCDEFGH with 2 (len 8)
      2L -> "zzABCDEFGHqqqqqq",
      3L -> "ppppppppppppp",          // 13 identical chars vs 4
      4L -> "ppppppppppppp",
      5L -> "ab",                     // shorter than minLen: no grams
      6L -> "ABCDEF"                  // sub-threshold overlap with 1/2 at L=8
    )
    val got = runsOf(Dedup.duplicatedSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 8))
    // twins: one maximal run, full length; p-runs: every diagonal of
    // the 13-char identical pair yields ONE maximal run per diagonal
    assert(got.contains((1L, 2L, 5L, 3L, 8L)))
    assert(got.contains((3L, 4L, 1L, 1L, 13L)))
    // all (3,4) runs are diagonal-maximal: 13-char p-block at offsets
    // -5..5 → 11 diagonals, run length 13 - |d|
    val p34 = got.filter(r => r._1 == 3L && r._2 == 4L)
    assert(p34.size == 11 && p34.forall { case (_, _, sa, sb, len) =>
      len == 13L - math.abs(sa - sb) && len >= 8L })
    assert(!got.exists(r => r._1 == 6L || r._2 == 6L || r._1 == 5L || r._2 == 5L))
  }

  test("excise: keeps the lowest-id copy, merges overlapping spans, empties full dups") {
    import spark.implicits._
    val docs = Seq(
      1L -> "HEADER-ONE-xxxxxxxx-HEADER-TWO",
      // 2 shares both headers, overlapping through the middle of its text
      2L -> "HEADER-ONE-HEADER-TWO-tail",
      3L -> "HEADER-ONE-xxxxxxxx-HEADER-TWO" // full twin of 1: fully excised
    )
    val got = Dedup.exciseDuplicatedSubstrings(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    Dedup.releaseAll(spark)
    val want = bruteExcise(docs, 8)
    assert(got == want, s"got=$got want=$want")
    assert(got(3L)._2 == "", "a full twin must excise to empty")
    assert(!got.contains(1L), "the lowest-id copy is never touched")
  }

  // dense-repeat generator: tiny alphabet + occasionally planted shared
  // blocks so runs cross doc boundaries at many diagonals
  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(2, 6)
    block <- Gen.listOfN(12, Gen.oneOf('a', 'b')).map(_.mkString)
    docs <- Gen.listOfN(n, for {
      m <- Gen.choose(0, 24)
      cs <- Gen.listOfN(m, Gen.oneOf('a', 'b', 'c'))
      plant <- Gen.oneOf(true, false)
      at <- Gen.choose(0, m)
    } yield {
      val base = cs.mkString
      if (plant) base.substring(0, at) + block + base.substring(at) else base
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }

  test("random corpora: pairs and excise equal the brute force") {
    import spark.implicits._
    val gen = for {
      docs <- genDocs
      l <- Gen.choose(4, 7)
    } yield (docs, l)
    check(Prop.forAllNoShrink(gen) { case (docs, l) =>
      val df = docs.toDF("doc_id", "text")
      val gotRuns = runsOf(
        Dedup.duplicatedSubstrings(df, "doc_id", "text", l))
      val wantRuns = bruteRuns(docs, l)
      val gotEx = Dedup.exciseDuplicatedSubstrings(df, "doc_id", "text", l)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      Dedup.releaseAll(spark)
      val wantEx = bruteExcise(docs, l)
      val ok = gotRuns == wantRuns && gotEx == wantEx
      if (!ok) println(s"FAIL l=$l docs=$docs\n runs got=$gotRuns want=$wantRuns\n ex got=$gotEx want=$wantEx")
      ok
    }, 25)
  }

  test("sampled anchors: the reporting bound is exact at both edges") {
    import spark.implicits._
    // L=6, w=3 -> bound 8: an 8-char shared block must be reported with
    // exact boundaries; a 7-char one must not (below the bound)
    val docs = Seq(
      1L -> "xxABCDEFGHxx",   // 8-char block with 2: at the bound
      2L -> "qqqABCDEFGHq",
      3L -> "zzSTUVWXYzzz",   // 7-char block with 4: below the bound
      4L -> "ppSTUVWXYppp")
    val got = runsOf(Dedup.duplicatedSubstringsSampled(
      docs.toDF("doc_id", "text"), "doc_id", "text", minLen = 6, w = 3))
    assert(got == Set((1L, 2L, 3L, 4L, 8L)), s"got=$got")
  }

  /** Reference winnowing: the aggregate-HOF window-min fold (identical
    * hash — SQL xxhash64 over the CODEPOINT substring — and identical
    * rightmost tie-break via the <= replacement). Pure Spark SQL, so
    * it is also the arbiter of codepoint semantics for non-ASCII docs:
    * the native generator's hand-rolled UTF-8 offset table must land
    * on the same substrings Spark's substring() selects. */
  private def hofAnchors(txt: org.apache.spark.sql.DataFrame,
      l: Int, w: Int): Set[String] = {
    import org.apache.spark.sql.functions.{col, explode, expr}
    txt.select(col("id"), expr(
      s"""CASE WHEN length(t) >= ${l + w - 1} THEN
            transform(sequence(1, length(t) - ${l - 1}),
              i -> xxhash64(substring(t, i, $l)))
          ELSE CAST(array() AS ARRAY<BIGINT>) END""").as("hs"))
      .select(col("id"), explode(expr(
        s"""CASE WHEN size(hs) >= $w THEN
              transform(
                array_distinct(
                  transform(sequence(1, size(hs) - ${w - 1}),
                    s -> aggregate(sequence(s + 1, s + ${w - 1}),
                           struct(element_at(hs, s) AS mh,
                                  CAST(s AS BIGINT) AS mp),
                           (st, i) -> CASE
                             WHEN element_at(hs, i) <= st.mh
                             THEN struct(element_at(hs, i) AS mh,
                                         CAST(i AS BIGINT) AS mp)
                             ELSE st END).mp)),
                p -> struct(p AS pos,
                            element_at(hs, CAST(p AS INT)) AS h))
            ELSE CAST(array()
              AS ARRAY<STRUCT<pos: BIGINT, h: BIGINT>>) END""")).as("g"))
      .select(col("id"), col("g.pos").as("pos"), col("g.h").as("h"))
      .collect().map(_.toString).toSet
  }

  test("native winnowing generator equals the SQL HOF formulation of the same selection") {
    import spark.implicits._
    val gen = for {
      docs <- genDocs
      l <- Gen.choose(3, 6)
      w <- Gen.choose(2, 5)
    } yield (docs, l, w)
    check(Prop.forAllNoShrink(gen) { case (docs, l, w) =>
      val txt = docs.toDF("id", "t")
      val got = Dedup.winnowedAnchorFrame(txt, l, w)
        .collect().map(_.toString).toSet
      val want = hofAnchors(txt, l, w)
      val ok = got == want
      if (!ok) println(s"FAIL l=$l w=$w docs=$docs\n got=$got\n want=$want")
      ok
    }, 20)
  }

  test("native winnowing generator matches Spark codepoint semantics on multibyte text") {
    import spark.implicits._
    // 1/2/3/4-byte codepoints, including a SUPPLEMENTARY one (𝕏 — two
    // Java chars, one codepoint): the generator's hand-rolled UTF-8
    // codepoint-offset table must select the same substrings and
    // positions as Spark's own substring()/xxhash64 (the HOF arbiter).
    // A mismatch silently drops anchors — the exact-residual filter
    // would hide it as false-negative spans, so this is the one place
    // the byte table is tested directly.
    val cps = Seq("a", "b", "é", "ß", "ह", "世", "𝕏", "🜁")
    val gen = for {
      n <- Gen.choose(1, 5)
      block <- Gen.listOfN(6, Gen.oneOf(cps)).map(_.mkString)
      docs <- Gen.listOfN(n, for {
        m <- Gen.choose(0, 18)
        segs <- Gen.listOfN(m, Gen.oneOf(cps))
        plant <- Gen.oneOf(true, false)
      } yield if (plant) segs.mkString + block else segs.mkString)
      l <- Gen.choose(3, 6)
      w <- Gen.choose(2, 5)
    } yield (docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }, l, w)
    check(Prop.forAllNoShrink(gen) { case (docs, l, w) =>
      val txt = docs.toDF("id", "t")
      val got = Dedup.winnowedAnchorFrame(txt, l, w)
        .collect().map(_.toString).toSet
      val want = hofAnchors(txt, l, w)
      val ok = got == want
      if (!ok) println(s"FAIL l=$l w=$w docs=$docs\n got=$got\n want=$want")
      ok
    }, 20)
  }

  test("regime guard: twin-heavy corpora fall back to dense; planted-block corpora stay sampled") {
    import spark.implicits._
    // six verbatim twins: every anchor survives with __n = 6, so the
    // ordered-pair count (sum of __n - 1) is ~5x the anchor count and
    // clears the corpus character count — the guard must choose dense
    val twins = (1L to 6L)
      .map(i => (i, "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmn"))
    // guardSlice = 1: the exact (unsliced) estimator — unit corpora are
    // too small for the 1/64 production slice to be populated
    val (d1, fell1) = Dedup.duplicatedSubstringsSampledImpl(
      twins.toDF("doc_id", "text"), "doc_id", "text", 6, 3,
      guardSlice = 1)
    val got1 = runsOf(d1)
    assert(fell1, "verbatim twins must trip the dense fallback")
    assert(got1 == bruteRuns(twins, 6).filter(_._5 >= 8L),
      "fallback output must be the dense truth at the reporting bound")
    // mostly-clean: distinct pseudo-random docs, one planted shared
    // block between two of them — surviving anchors are block-only,
    // far below the character count: the sampled path must be kept
    val clean = (1L to 8L).map { i =>
      val base = (0 until 60)
        .map(j => ('a' + ((i * 7 + j * 13 + j * j * i) % 26)).toChar)
        .mkString
      (i, if (i <= 2) base + "SHAREDBLOCK123" else base)
    }
    val (d2, fell2) = Dedup.duplicatedSubstringsSampledImpl(
      clean.toDF("doc_id", "text"), "doc_id", "text", 6, 3,
      guardSlice = 1)
    val got2 = runsOf(d2)
    assert(!fell2, "a mostly-clean corpus must stay on the sampled path")
    assert(got2 == bruteRuns(clean, 6).filter(_._5 >= 8L))
  }

  test("random corpora: sampled anchors equal the brute force above the reporting bound") {
    import spark.implicits._
    val gen = for {
      docs <- genDocs
      l <- Gen.choose(4, 6)
      w <- Gen.choose(2, 5)
    } yield (docs, l, w)
    check(Prop.forAllNoShrink(gen) { case (docs, l, w) =>
      val df = docs.toDF("doc_id", "text")
      val got = runsOf(Dedup.duplicatedSubstringsSampled(
        df, "doc_id", "text", l, w))
      val want = bruteRuns(docs, l)
        .filter(_._5 >= l + w - 1L)
      val ok = got == want
      if (!ok) println(s"FAIL l=$l w=$w docs=$docs\n got=$got\n want=$want")
      ok
    }, 25)
  }

  test("random corpora: bipartite contamination pairs and train excise equal the brute force") {
    import spark.implicits._
    val gen = for {
      docs <- genDocs
      l <- Gen.choose(4, 7)
    } yield (docs, l)
    check(Prop.forAllNoShrink(gen) { case (docs, l) =>
      val (train, bench) = docs.partition(_._1 % 2 == 1)
      val dfT = train.toDF("doc_id", "text")
      val dfB = bench.toDF("doc_id", "text")
      val gotRuns = runsOf(Dedup.duplicatedSubstringsWith(
        dfT, "doc_id", "text", dfB, "doc_id", "text", l))
      val wantRuns = bruteRunsWith(train, bench, l)
      val gotEx = Dedup.exciseContaminated(
          dfT, "doc_id", "text", dfB, "doc_id", "text", l)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
      Dedup.releaseAll(spark)
      // local reference: merge+slice of the doc_a-side spans
      val spans = wantRuns.toSeq
        .map { case (da, _, sa, _, len) => da -> ((sa, sa + len)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
      val text = train.toMap
      val wantEx = spans.map { case (id, sp) =>
        val tx = text(id)
        var cur = 1L
        val acc = new StringBuilder
        sp.foreach { case (s, e) =>
          if (s > cur) acc.append(tx.substring(cur.toInt - 1, s.toInt - 1))
          cur = math.max(cur, e)
        }
        if (cur <= tx.length) acc.append(tx.substring(cur.toInt - 1))
        id -> ((tx.length.toLong, acc.toString))
      }
      val ok = gotRuns == wantRuns && gotEx == wantEx
      if (!ok) println(s"FAIL l=$l docs=$docs\n runs got=$gotRuns want=$wantRuns\n ex got=$gotEx want=$wantEx")
      ok
    }, 20)
  }
}
