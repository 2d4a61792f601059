package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.athenaeum.SparkSpec

/** Differential property test for the custom operator: on RANDOM tables
  * (random group cardinality, duplicate sort keys, ties everywhere) the
  * operator must return exactly the window+filter formulation's rows —
  * the tie-break discipline (full deterministic sort key) is part of the
  * contract. */
class TopKPerGroupPropSpec extends SparkSpec {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genRows: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, 6L)   // few groups -> deep groups
      v <- Gen.choose(0L, 9L)   // heavy sort-key ties
      id <- Gen.choose(0L, 1000000L)
    } yield (g, v, id))
  } yield rows

  test("random tables: custom operator == window+filter for random k") {
    import spark.implicits._
    val prop = Prop.forAll(genRows, Gen.choose(1, 6)) { (rows, k) =>
      // distinct ids make the composite sort key total -> deterministic
      val df = rows.zipWithIndex
        .map { case ((g, v, _), i) => (g, v, i.toLong) }
        .toDF("g", "v", "id")
      val got = TopK.topKPerGroup(df, Seq("g"),
        Seq(df.col("v").desc, df.col("id")), k)
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val ref = df.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
      got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty
    }
    check(prop, 30)
  }
}
