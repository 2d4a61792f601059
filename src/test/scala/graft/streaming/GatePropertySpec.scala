package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec
import graft.operators.{Dedup, Events, Spatial}
import graft.sources.VersionedTable

/** Randomized stream-split differentials for ALL five streaming gates
  * (every [[GateKit]] client): a random point/document/event set split
  * into a RANDOM sequence of batches must leave the cumulative output
  * table equal to the one-shot batch operator over everything (or, for
  * the order-dependent boilerplate gate, equal to an independently
  * folded prefix truth) — whatever the split boundaries, id orderings
  * across batches, or per-batch sizes (including empty batches). The
  * fixed-seed gate specs pin the known edge classes; these sweeps hunt
  * the unknown ones. */
class GatePropertySpec extends SparkSpec {

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

  /** Split `items` into batches at random boundaries (some empty). */
  private def genSplit[T](items: Seq[T]): Gen[Seq[Seq[T]]] = for {
    nb <- Gen.choose(1, 4)
    marks <- Gen.listOfN(items.size, Gen.choose(0, nb - 1))
  } yield (0 until nb).map(b =>
    items.zip(marks).collect { case (x, m) if m == b => x })

  test("SpatialGate: random point sets under random batch splits equal the batch join") {
    import spark.implicits._
    val genCase = for {
      n <- Gen.choose(0, 24)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 30L); y <- Gen.choose(0L, 30L)
      } yield (x, y))
      split <- genSplit(pts.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong + 1L, x, y) })
      r <- Gen.choose(1L, 8L)
      cell <- Gen.oneOf(r, math.max(1L, r / 2), r * 2)
    } yield (split, r, cell)
    check(Prop.forAllNoShrink(genCase) { case (batches, r, cell) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sgp").toString
      val snk = SpatialGate.sink(s"$dir/state", s"$dir/out",
        "id", "x", "y", r, cell)
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("id", "x", "y"), i.toLong) }
      val all = batches.flatten
      val want =
        if (all.isEmpty) Set.empty[String]
        else canon(Spatial.radiusJoin(all.toDF("id", "x", "y"),
          "id", "x", "y", r, cell))
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL r=$r cell=$cell batches=$batches\n got=$got\n want=$want")
      ok
    }, 12)
  }

  test("SubstrGate: random corpora under random batch splits equal the batch operator") {
    import spark.implicits._
    val word = Gen.oneOf('a', 'b', 'c')
    val genCase = for {
      n <- Gen.choose(0, 10)
      block <- Gen.listOfN(8, Gen.oneOf('a', 'b')).map(_.mkString)
      docs <- Gen.listOfN(n, for {
        m <- Gen.choose(0, 14)
        cs <- Gen.listOfN(m, word)
        plant <- Gen.oneOf(true, false)
      } yield if (plant) cs.mkString + block else cs.mkString)
      split <- genSplit(docs.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1L, t) })
      l <- Gen.choose(4, 6)
    } yield (split, l)
    check(Prop.forAllNoShrink(genCase) { case (batches, l) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-sbp").toString
      val snk = SubstrGate.sink(s"$dir/docs", s"$dir/grams",
        s"$dir/out", "doc_id", "text", l)
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("doc_id", "text"), i.toLong) }
      val all = batches.flatten
      val want =
        if (all.isEmpty) Set.empty[String]
        else canon(Dedup.duplicatedSubstrings(all.toDF("doc_id", "text"),
          "doc_id", "text", l))
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL l=$l batches=$batches\n got=$got\n want=$want")
      ok
    }, 10)
  }

  test("SemGate: random vector sets under random batch splits equal the frozen-quantizer operator") {
    import spark.implicits._
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    // vectors from a few directions plus jitter: near-dups inside a
    // direction, cells data-dependent; splits where the first non-empty
    // batch is tiny exercise the no-PQ (unscreened) path
    val genCase = for {
      n <- Gen.choose(0, 16)
      vecs <- Gen.listOfN(n, for {
        d <- Gen.choose(0, 2)
        j <- Gen.choose(0, 4)
      } yield Array.tabulate(8)(i =>
        (if (i == d) 10f else 0f) + 0.1f * ((i * 7 + j * 13 + d) % 5)))
      split <- genSplit(vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong + 1L, v) })
    } yield split
    check(Prop.forAllNoShrink(genCase) { batches =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-smp").toString
      val snk = SemGate.sink(s"$dir/state", s"$dir/out",
        "vec_id", "embedding", 0.9, ncells = 2, kmIters = 2,
        m = 2, ks = 4, sd = 4, pqIters = 1, nBuckets = 8)
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("vec_id", "embedding"), i.toLong) }
      val all = batches.flatten
      val want = batches.find(_.nonEmpty) match {
        case None => Set.empty[String]
        case Some(first) =>
          val cent = Similarity.kmeansCodebook(
            first.toDF("vec_id", "embedding").select(col("vec_id"),
              Similarity.unitVec("embedding").as("nv")),
            "vec_id", "nv", ncells = 2, iters = 2)
          canon(Similarity.cellPairsFrozen(
            all.toDF("vec_id", "embedding"), "vec_id", "embedding",
            cent, 0.9))
      }
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL batches=${batches.map(_.map(_._1))}\n got=$got\n want=$want")
      ok
    }, 10)
  }

  test("SemGate epoch roll at a random boundary: output equals oldTruth(prefix) ∪ newTruth(all)") {
    import spark.implicits._
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    // same vector family as the plain SemGate sweep, plus a roll after
    // a RANDOM batch boundary with a DIFFERENT ncells — covering rolls
    // over tiny prefixes (no PQ), rolls after empty batches (no-op
    // because nothing trained), and post-roll batches including empties
    val genCase = for {
      n <- Gen.choose(0, 16)
      vecs <- Gen.listOfN(n, for {
        d <- Gen.choose(0, 2)
        j <- Gen.choose(0, 4)
      } yield Array.tabulate(8)(i =>
        (if (i == d) 10f else 0f) + 0.1f * ((i * 7 + j * 13 + d) % 5)))
      split <- genSplit(vecs.zipWithIndex.map { case (v, i) =>
        (i.toLong + 1L, v) })
      rollAfter <- Gen.choose(1, 4)
    } yield (split, rollAfter)
    check(Prop.forAllNoShrink(genCase) { case (batches, rollAfter) =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-smr").toString
      val snk = SemGate.sink(s"$dir/state", s"$dir/out",
        "vec_id", "embedding", 0.9, ncells = 2, kmIters = 2,
        m = 2, ks = 4, sd = 4, pqIters = 1, nBuckets = 8)
      val (pre, post) = batches.zipWithIndex.splitAt(rollAfter)
      pre.foreach { case (b, i) => snk(b.toDF("vec_id", "embedding"), i.toLong) }
      val epoch = SemGate.rollEpoch(spark, s"$dir/state", s"$dir/out",
        0.9, fromEpoch = 0, ncells = 3, kmIters = 2, m = 2, ks = 4,
        sd = 4, pqIters = 1, nBuckets = 8)
      post.foreach { case (b, i) => snk(b.toDF("vec_id", "embedding"), i.toLong) }
      def km(rows: Seq[(Long, Array[Float])], k: Int) =
        Similarity.kmeansCodebook(
          rows.toDF("vec_id", "embedding").select(col("vec_id"),
            Similarity.unitVec("embedding").as("nv")),
          "vec_id", "nv", ncells = k, iters = 2)
      def truth(rows: Seq[(Long, Array[Float])],
          cent: Array[Array[Double]]): Set[String] =
        canon(Similarity.cellPairsFrozen(
          rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
          cent, 0.9))
      val prefix = pre.map(_._1).flatten
      val all = batches.flatten
      val want = batches.find(_.nonEmpty) match {
        case None => Set.empty[String]
        case Some(first) =>
          val cent0 = km(first, 2)
          if (epoch == 1) truth(prefix, cent0) ++ truth(all, km(prefix, 3))
          else truth(all, cent0) // roll no-op'd: nothing trained yet
      }
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL rollAfter=$rollAfter epoch=$epoch " +
        s"batches=${batches.map(_.map(_._1))}\n got=$got\n want=$want")
      ok
    }, 8)
  }

  test("ChangepointGate: random event streams under random batch splits equal the batch CUSUM") {
    import spark.implicits._
    def nanos(day: Long, j: Long) =
      day * 86400000000000L + j * 1000000000L
    val genCase = for {
      n <- Gen.choose(1, 30)
      evs <- Gen.listOfN(n, for {
        key <- Gen.oneOf("A", "B")
        day <- Gen.choose(0L, 4L)
        j <- Gen.choose(0L, 9L)
      } yield (nanos(day, j), key))
      split <- genSplit(evs)
    } yield split
    check(Prop.forAllNoShrink(genCase) { batches =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-cgp").toString
      val snk = ChangepointGate.sink(s"$dir/state", s"$dir/out",
        "event_type")
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("ts", "event_type"), i.toLong) }
      val all = batches.flatten
      val want =
        if (all.isEmpty) Set.empty[String]
        else canon(Events.cusumDaily(all.toDF("ts", "event_type"),
          "event_type"))
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL batches=$batches\n got=$got\n want=$want")
      ok
    }, 8)
  }

  test("ClusterMaintainer: random near-dup corpora under random batch splits equal the one-shot clustering") {
    import spark.implicits._
    // three vocabulary-disjoint families plus a bridge over two of them:
    // random members produce candidate graphs whose connectivity the
    // streamed fold must reproduce exactly (unbounded maxBucket)
    val fam = Vector(
      "alpha beta gamma delta epsilon zeta eta theta iota",
      "one two three four five six seven eight nine",
      "red orange yellow green blue indigo violet umber ochre")
    val bridge = "gamma delta epsilon zeta three four five six"
    val genCase = for {
      n <- Gen.choose(1, 8)
      docs <- Gen.listOfN(n, for {
        f <- Gen.choose(0, 3)
        tail <- Gen.oneOf("kappa", "lambda")
      } yield if (f == 3) bridge else s"${fam(f)} $tail")
      split <- genSplit(docs.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1L, t) })
    } yield split
    check(Prop.forAllNoShrink(genCase) { batches =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-cmp").toString
      val snk = ClusterMaintainer.sink(s"$dir/labels", s"$dir/sigs",
        "doc_id", "text")
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("doc_id", "text"), i.toLong) }
      val all = batches.flatten
      val want =
        if (all.isEmpty) Set.empty[String]
        else {
          val sigs = Dedup.persistTracked(
            Dedup.minhashSignatures(all.toDF("doc_id", "text"),
              "doc_id", "text"))
          canon(Dedup.clustersStar(
            Dedup.candidatesFromSignatures(sigs, "doc_id")
              .select("doc_a", "doc_b"), "doc_a", "doc_b"))
        }
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/labels")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/labels", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/labels"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL batches=$batches\n got=$got\n want=$want")
      ok
    }, 6)
  }

  test("BoilerplateGate: random corpora under random batch splits equal the independently folded prefix truth") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.GraftFunctions
    val banner = (1 to 10).map(i => s"b$i").mkString(" ")
    val genCase = for {
      n <- Gen.choose(1, 8)
      docs <- Gen.listOfN(n, for {
        plant <- Gen.oneOf(true, false)
        tag <- Gen.oneOf("p", "q", "r")
      } yield if (plant) banner
              else (1 to 10).map(i => s"$tag$i").mkString(" "))
      split <- genSplit(docs.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1L, t) })
    } yield split
    check(Prop.forAllNoShrink(genCase) { batches =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft-bgp").toString
      val snk = BoilerplateGate.sink(s"$dir/freq", s"$dir/out",
        "doc_id", "text", chunkTokens = 10, minDocs = 3,
        compactEvery = 2)
      batches.zipWithIndex.foreach { case (b, i) =>
        snk(b.toDF("doc_id", "text"), i.toLong) }
      // independent prefix fold: cumulative per-hash distinct-doc counts
      // maintained in plain Scala, excision replayed per batch with the
      // batch operator's own pieces
      var freq = Map.empty[Long, Long]
      val want = batches.flatMap { b =>
        if (b.isEmpty) Seq.empty[String]
        else {
          val ch = Dedup.chunkSegments(b.toDF("doc_id", "text"),
            "doc_id", "text", 10)
          val inc = ch
            .select(col("doc_id"),
              GraftFunctions.polyHash(col("chunk")).as("h"))
            .distinct().collect()
            .groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
          freq = (freq.keySet ++ inc.keySet).map(h =>
            h -> (freq.getOrElse(h, 0L) + inc.getOrElse(h, 0L))).toMap
          val boiler = freq.filter(_._2 >= 3L).keys.toSeq.toDF("h")
          val s = Dedup.exciseByHashes(ch, "doc_id", boiler)
            .collect().map(_.toString).toSeq
          Dedup.releaseAll(spark)
          s
        }
      }.toSet
      val got = {
        val vs = VersionedTable.versions(spark, s"$dir/out")
        if (vs.isEmpty ||
            VersionedTable.rowCount(spark, s"$dir/out", vs.last) == 0L)
          Set.empty[String]
        else canon(VersionedTable.read(spark, s"$dir/out"))
      }
      val ok = got == want
      if (!ok) println(s"FAIL batches=$batches\n got=$got\n want=$want")
      ok
    }, 6)
  }
}
