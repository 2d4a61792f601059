package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.athenaeum.SparkSpec
import graft.operators.{Dedup, Spatial}
import graft.sources.VersionedTable

/** Randomized stream-split differentials for the streaming gates: a
  * random point/document set split into a RANDOM sequence of batches
  * must leave the cumulative output table equal to the one-shot batch
  * operator over everything — whatever the split boundaries, id
  * orderings across batches, or per-batch sizes (including empty
  * batches). The fixed-seed gate specs pin the known edge classes;
  * these sweeps hunt the unknown ones. */
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
}
