package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec

/** Randomized differentials for the retrieval/graph composites:
  * random tiny-alphabet documents × random phrases against a local
  * window matcher (both the HOF scan and the index-join plan), and
  * random graphs against a local wedge counter. Fixed-seed specs pin
  * the known edge classes; these sweeps hunt the unknown ones. */
class RetrievalPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // tiny alphabet → dense repeats, overlapping matches, phrases that
  // straddle doc ends; blank/whitespace docs keep the tokenizer honest
  private val word = Gen.oneOf("a", "b", "c", "aa")
  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, for {
      m <- Gen.choose(0, 12)
      ws <- Gen.listOfN(m, word)
      pad <- Gen.oneOf("", " ", "  ")
    } yield ws.mkString(" ") + pad)
  } yield docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }

  private def localPhrase(docs: Seq[(Long, String)],
      phrase: Seq[String]): Map[Long, (Long, Long)] =
    docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" +").filter(_.nonEmpty).toSeq
      val hits = (1 to toks.size - phrase.size + 1)
        .filter(s => phrase.indices.forall(j => toks(s + j - 1) == phrase(j)))
      if (hits.isEmpty) None
      else Some(id -> ((hits.size.toLong, hits.min.toLong)))
    }.toMap

  test("phraseScan and phraseQuery equal the local matcher on random corpora") {
    import spark.implicits._
    val gen = for {
      docs <- genDocs
      plen <- Gen.choose(1, 4)
      phrase <- Gen.listOfN(plen, word)
    } yield (docs, phrase)
    check(Prop.forAllNoShrink(gen) { case (docs, phrase) =>
      val df = docs.toDF("doc_id", "text")
      val expect = localPhrase(docs, phrase)
      def asMap(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      asMap(TextAnalysis.phraseScan(df, "doc_id", "text", phrase)) == expect &&
        asMap(TextAnalysis.phraseQuery(
          TextAnalysis.positionalIndex(df, "doc_id", "text"),
          "doc_id", phrase)) == expect
    }, 30)
  }

  test("linkPredict equals the local wedge counter on random graphs") {
    import spark.implicits._
    val genGraph = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, Gen.zip(
        Gen.choose(1L, n.toLong), Gen.choose(1L, n.toLong)))
      cap <- Gen.choose(1L, 8L)
    } yield (es.filter(e => e._1 != e._2), cap)
    check(Prop.forAllNoShrink(genGraph) { case (es, cap) =>
      val sym = (es ++ es.map(e => (e._2, e._1))).toSet
      val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      val expect = (for {
        (z, a) <- sym if deg(z) <= cap
        (z2, b) <- sym if z2 == z && a < b
      } yield (a, b, z)).toSeq
        .groupBy(p => (p._1, p._2))
        .filterNot { case (k, _) => sym.contains(k) }
        .map { case ((a, b), ws) =>
          (a, b, ws.size.toLong,
            ws.map(w => 1000000000L / deg(w._3)).sum)
        }.toSet
      // topK larger than any possible pair count: the cut never bites,
      // so set equality is exact
      val got =
        if (es.isEmpty) Set.empty[(Long, Long, Long, Long)]
        else Graph.linkPredict(es.toDF("s", "d"), "s", "d",
            maxHubDegree = cap, topK = 10000)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
      got == expect
    }, 25)
  }
}
