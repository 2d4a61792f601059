package graft.operators

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.functions._

/** Phrase retrieval (stored-index join plan vs HOF scan plan vs a local
  * reference) and link prediction (differential vs a brute-force wedge
  * count, hub cap, not-yet-linked filter). */
class RetrievalGraphSpec extends SparkSpec {

  private val docs = Seq(
    (1L, "a a a b"),          // overlapping "a a" hits at 1 and 2
    (2L, "a b a b a"),        // alternating; "a b" at 1 and 3
    (3L, "b"),                // shorter than any 2-word phrase
    (4L, "x y z a b"),        // match at the very end
    (5L, ""),                 // empty text
    (6L, "A   B"))            // case-fold + multi-space tokenizer path

  private def localPhrase(phrase: Seq[String])
      : Map[Long, (Long, Long)] =
    docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
      val hits = (1 to toks.size - phrase.size + 1)
        .filter(s => phrase.indices.forall(j => toks(s + j - 1) == phrase(j)))
      if (hits.isEmpty) None
      else Some(id -> ((hits.size.toLong, hits.min.toLong)))
    }.toMap

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("phraseScan and phraseQuery agree with a local reference") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    for (phrase <- Seq(Seq("a", "a"), Seq("a", "b"), Seq("a", "b", "a"),
      Seq("b"), Seq("z", "a", "b"), Seq("missing", "phrase"))) {
      val expect = localPhrase(phrase)
      val scan = asMap(TextAnalysis.phraseScan(df, "doc_id", "text", phrase))
      val idx = asMap(TextAnalysis.phraseQuery(
        TextAnalysis.positionalIndex(df, "doc_id", "text"),
        "doc_id", phrase))
      assert(scan == expect, s"phraseScan diverged on $phrase")
      assert(idx == expect, s"phraseQuery diverged on $phrase")
    }
  }

  test("positionalIndex positions are 1-based in token order") {
    import spark.implicits._
    val idx = TextAnalysis.positionalIndex(
        Seq((7L, "x  y x")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(idx == Set(("x", 1L), ("y", 2L), ("x", 3L)))
  }

  test("proximityRank: AND semantics, min-span equals a local sliding window, tight beats diffuse") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "p q r x x x x x x x x x x"),   // tight: span 3
      (2L, "p x x x x q x x x x x x r"),   // diffuse: span 13
      (3L, "q p x r p x q"),                // best window inside: p..r = 3? q p r? positions q1 p2 r4 -> 4; p2 r4 q7 no; local ref decides
      (4L, "p q x x x x x x x x x x x"),   // missing r: excluded by AND
      (5L, "r q p"))                        // reversed order: span 3
    val terms = Seq("p", "q", "r")
    def localSpan(text: String): Option[Long] = {
      val toks = text.split(" +").filter(_.nonEmpty).toSeq
      val wins = for {
        i <- toks.indices; j <- i until toks.size
        w = toks.slice(i, j + 1)
        if terms.forall(w.contains)
      } yield (j - i + 1).toLong
      wins.minOption
    }
    val got = TextAnalysis.proximityRank(
        TextAnalysis.positionalIndex(corpus.toDF("doc_id", "text"),
          "doc_id", "text"), "doc_id", terms, k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    Dedup.releaseAll(spark)
    val expectSpans = corpus.flatMap { case (id, t) =>
      localSpan(t).map(id -> _) }.toMap
    assert(got.keySet == expectSpans.keySet,
      s"AND semantics: got ${got.keySet}, want ${expectSpans.keySet}")
    got.foreach { case (id, (span, _)) =>
      assert(span == expectSpans(id),
        s"doc $id span $span != local ${expectSpans(id)}") }
    // equal tf/dl across 1 and 2 -> the proximity bonus alone decides
    assert(got(1L)._2 < got(2L)._2,
      "the tight doc must outrank the diffuse one")
  }

  test("linkPredict equals brute-force wedge evidence on a known graph") {
    import spark.implicits._
    // path 1-2-3-4 plus hub 9 linked to 1,2,3: predicts (1,3) via 2 and
    // 9, (2,4) via 3, (1,2)... already linked pairs must NOT appear
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (9L, 1L), (9L, 2L), (9L, 3L))
    val sym = (edges ++ edges.map(e => (e._2, e._1))).toSet
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val wedgePairs = (for {
      (z, a) <- sym; (z2, b) <- sym if z2 == z && a < b
    } yield (a, b, z)).toSeq
    val expect = wedgePairs.groupBy(p => (p._1, p._2))
      .filterNot { case (k, _) => sym.contains(k) }
      .map { case ((a, b), ws) =>
        (a, b, ws.size.toLong, ws.map(w => 1000000000L / deg(w._3)).sum)
      }.toSet
    val got = Graph.linkPredict(edges.toDF("s", "d"), "s", "d",
        maxHubDegree = 1000L, topK = 100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect)
    assert(!got.exists(p => sym.contains((p._1, p._2))),
      "an already-linked pair leaked into the predictions")
  }

  test("personalizedPagerank equals a local integer fixed-point reference") {
    import spark.implicits._
    // path graph 1-2-3-4-5 plus a branch 3-6, seeded at {1}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
    val sym = edges ++ edges.map(e => (e._2, e._1))
    val nodes = sym.map(_._1).distinct.sorted
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val scale = 1000000000000L
    val seeds = Set(1L)
    var rank = nodes.map(n =>
      n -> (if (seeds(n)) scale / seeds.size else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) / deg(u) }.sum }
      rank = nodes.map(n => n ->
        ((if (seeds(n)) 1L else 0L) * 15L * scale / (100L * seeds.size) +
          85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = Graph.personalizedPagerank(
        sym.toDF("s", "d"), "s", "d", Seq(1L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == rank)
    // proximity semantics: mass reaches only what 3 rounds can touch —
    // the far end of the path (distance 4) holds exactly zero, near
    // nodes hold real mass, and the seed keeps its teleport share
    assert(got(2L) > 0L && got(1L) > 0L && got(5L) == 0L)
    assert(got(2L) > got(4L))
  }

  test("hub cap removes high-degree wedge centers, keeps them as endpoints") {
    import spark.implicits._
    // star: hub 9 connects 1..5; every (i, j) wedge goes THROUGH 9 only
    val edges = (1L to 5L).map(i => (9L, i))
    val capped = Graph.linkPredict(edges.toDF("s", "d"), "s", "d",
      maxHubDegree = 4L, topK = 100)
    assert(capped.count() == 0, "wedges through the capped hub survived")
    val uncapped = Graph.linkPredict(edges.toDF("s", "d"), "s", "d",
      maxHubDegree = 5L, topK = 100)
    // C(5,2) = 10 non-adjacent pairs, each with exactly one wedge via 9
    assert(uncapped.count() == 10)
    assert(uncapped.select(min(col("ra_score_fx"))).head().getLong(0) ==
      1000000000L / 5L)
  }
}
