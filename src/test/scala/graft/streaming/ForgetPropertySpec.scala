package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec
import graft.operators.{Dedup, Events, Spatial}
import graft.sources.VersionedTable

/** Randomized FORGET sweeps — the takedown contract under arbitrary
  * stream splits, forget points, and forget sets (including ids that
  * have not arrived yet — prospective takedowns — and ids that never
  * exist): the served output must equal the batch operator over
  * everything minus the forgotten, whatever the interleaving. The
  * fixed-seed [[GateForgetSpec]] pins the known windows; these hunt
  * the unknown ones. */
class ForgetPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = df.collect().map(_.toString).toSet
    Dedup.releaseAll(spark)
    s
  }

  private def genSplit[T](items: Seq[T]): Gen[Seq[Seq[T]]] = for {
    nb <- Gen.choose(1, 4)
    marks <- Gen.listOfN(items.size, Gen.choose(0, nb - 1))
  } yield (0 until nb).map(b =>
    items.zip(marks).collect { case (x, m) if m == b => x })

  test("SpatialGate: random splits + a random forget at a random boundary serve the batch join minus the forgotten points") {
    import spark.implicits._
    val genCase = for {
      n <- Gen.choose(0, 20)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 25L); y <- Gen.choose(0L, 25L)
      } yield (x, y))
      split <- genSplit(pts.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong + 1L, x, y) })
      fgt <- Gen.someOf(1L to (n.toLong + 2L)) // may include absent ids
      at <- Gen.choose(0, split.size)
      r <- Gen.choose(1L, 8L)
    } yield (split, fgt.toSeq.sorted, at, r)
    check(Prop.forAllNoShrink(genCase) { case (batches, fgt, at, r) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-fgp").toString
      val snk = SpatialGate.sink(s"$dir/state", s"$dir/out",
        "id", "x", "y", r, r)
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i == at && fgt.nonEmpty)
          SpatialGate.forget(spark, s"$dir/state", fgt, 0L)
        snk(b.toDF("id", "x", "y"), i.toLong)
      }
      if (at == batches.size && fgt.nonEmpty)
        SpatialGate.forget(spark, s"$dir/state", fgt, 0L)
      val kept = batches.flatten.filterNot(p => fgt.contains(p._1))
      val want =
        if (kept.isEmpty) Set.empty[String]
        else canon(Spatial.radiusJoin(kept.toDF("id", "x", "y"),
          "id", "x", "y", r, r))
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty) Set.empty[String]
        else canon(SpatialGate.served(spark, s"$dir/state", s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(
        s"FAIL r=$r at=$at fgt=$fgt batches=$batches\n got=$got\n want=$want")
      ok
    }, 12)
  }

  test("SubstrGate: random corpora + a random forget at a random boundary serve the batch operator minus the forgotten docs") {
    import spark.implicits._
    val word = Gen.oneOf('a', 'b', 'c')
    val genCase = for {
      n <- Gen.choose(0, 9)
      block <- Gen.listOfN(6, Gen.oneOf('a', 'b')).map(_.mkString)
      docs <- Gen.listOfN(n, for {
        m <- Gen.choose(0, 10)
        cs <- Gen.listOfN(m, word)
        plant <- Gen.oneOf(true, false)
      } yield if (plant) cs.mkString + block else cs.mkString)
      split <- genSplit(docs.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1L, t) })
      fgt <- Gen.someOf(1L to (n.toLong + 2L))
      at <- Gen.choose(0, split.size)
      l <- Gen.choose(4, 6)
    } yield (split, fgt.toSeq.sorted, at, l)
    check(Prop.forAllNoShrink(genCase) { case (batches, fgt, at, l) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-fgs").toString
      val snk = SubstrGate.sink(s"$dir/docs", s"$dir/grams",
        s"$dir/out", "doc_id", "text", l, nBuckets = 4)
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i == at && fgt.nonEmpty)
          SubstrGate.forget(spark, s"$dir/docs", s"$dir/grams", fgt, 0L)
        snk(b.toDF("doc_id", "text"), i.toLong)
      }
      if (at == batches.size && fgt.nonEmpty)
        SubstrGate.forget(spark, s"$dir/docs", s"$dir/grams", fgt, 0L)
      val kept = batches.flatten.filterNot(d => fgt.contains(d._1))
      val want =
        if (kept.isEmpty) Set.empty[String]
        else canon(Dedup.duplicatedSubstrings(
          kept.toDF("doc_id", "text"), "doc_id", "text", l))
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty) Set.empty[String]
        else canon(SubstrGate.served(spark, s"$dir/docs", s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(
        s"FAIL l=$l at=$at fgt=$fgt batches=$batches\n got=$got\n want=$want")
      ok
    }, 10)
  }

  test("ChangepointGate: a random key forget at a random boundary serves the CUSUM over all events minus the keys' pre-forget slice") {
    import spark.implicits._
    val genCase = for {
      n <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        day <- Gen.choose(0L, 4L)
      } yield (k, day))
      split <- genSplit(evs.zipWithIndex.map { case ((k, d), i) =>
        (i.toLong, k, d * 86400L * 1000000000L + 1L) })
      fgt <- Gen.someOf(Seq("a", "b", "c"))
      at <- Gen.choose(1, split.size) // after at least one batch
    } yield (split, fgt.toSeq.sorted, at)
    check(Prop.forAllNoShrink(genCase) { case (batches, fgt, at) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-fgc").toString
      val snk = ChangepointGate.sink(s"$dir/state", s"$dir/out",
        "event_type", nBuckets = 4, compactEvery = 2)
      var forgot = false
      batches.zipWithIndex.foreach { case (b, i) =>
        if (i == at && fgt.nonEmpty &&
            VersionedTable.versions(spark, s"$dir/out").nonEmpty) {
          ChangepointGate.forget(spark, s"$dir/state", "event_type",
            fgt, 0L)
          forgot = true
        }
        snk(b.toDF("event_id", "event_type", "ts"), i.toLong)
      }
      if (at == batches.size && fgt.nonEmpty &&
          VersionedTable.versions(spark, s"$dir/out").nonEmpty) {
        ChangepointGate.forget(spark, s"$dir/state", "event_type",
          fgt, 0L)
        forgot = true
      }
      // truth: drop the forgotten keys' events from batches BEFORE the
      // forget point; later re-arrivals count fresh
      val keptEvs = batches.zipWithIndex.flatMap { case (b, i) =>
        b.filterNot(e => forgot && fgt.contains(e._2) && i < at)
      }
      val want =
        if (keptEvs.isEmpty) Set.empty[String]
        else canon(Events.cusumDaily(
          keptEvs.toDF("event_id", "event_type", "ts"), "event_type"))
      val got =
        if (VersionedTable.versions(spark, s"$dir/out").isEmpty)
          Set.empty[String]
        else if (at == batches.size && forgot)
          // no batch ran after the forget: read the live state readout
          canon(ChangepointGate.readout(spark, s"$dir/state",
            "event_type"))
        else canon(VersionedTable.read(spark, s"$dir/out"))
      val ok = got == want
      if (!ok) println(
        s"FAIL at=$at fgt=$fgt forgot=$forgot batches=$batches\n got=$got\n want=$want")
      ok
    }, 12)
  }
}
