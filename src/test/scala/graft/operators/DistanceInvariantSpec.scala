package graft.operators

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.functions._

/** Mathematical invariants of the distribution-distance and sketch
  * operators — properties the DuckDB hash-match cannot express (it
  * proves engine parity, not that the math is the right math). */
class DistanceInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("TVD and Hellinger: bounds and the standard inequalities hold pairwise") {
    val tvd = graft.SparkEntry.queries("q_source_tvd")(spark, dir)
      .select(col("s1"), col("s2"), col("tvd")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val hel = graft.SparkEntry.queries("q_source_hellinger")(spark, dir)
      .select(col("s1"), col("s2"), col("hellinger")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(tvd.nonEmpty && tvd.keySet == hel.keySet)
    tvd.foreach { case (k, tv) =>
      val h = hel(k)
      assert(tv >= 0 && tv <= 1, s"$k TVD out of range: $tv")
      assert(h >= 0 && h <= 1, s"$k Hellinger out of range: $h")
      // H² ≤ TV ≤ √2·H for probability measures; the fixed-point
      // quantization can undershoot h by ≤ vocab·1e-6, so allow an
      // epsilon on each side
      assert(h * h <= tv + 1e-2, s"$k: H^2=${h * h} > TVD=$tv")
      assert(tv <= math.sqrt(2) * h + 1e-2,
        s"$k: TVD=$tv > sqrt(2)*H=${math.sqrt(2) * h}")
    }
  }

  test("count-min matrix merges by addition: two half-corpus sketches sum to the full one") {
    val full = graft.SparkEntry.queries("q_cmsketch")(spark, dir)
    def half(pred: String) = {
      val p = XHalf.cm(spark, dir, pred)
      p
    }
    val left = half("doc_id % 2 = 0")
    val right = half("doc_id % 2 = 1")
    val merged = left.select(col("r"), col("c"), col("cnt"))
      .unionAll(right.select(col("r"), col("c"), col("cnt")))
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))
    val diff = merged.as("m")
      .join(full.as("f"), Seq("r", "c"), "full_outer")
      .filter(coalesce(col("m.cnt"), lit(0L)) =!=
        coalesce(col("f.cnt"), lit(0L)))
      .count()
    assert(diff == 0, s"$diff cells differ between merged halves and full build")
  }
}

/** Builds the q_cmsketch matrix over a filtered slice of documents with
  * the same hash family (test-local twin of the query body). */
private object XHalf {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import graft.functions.XFormulas
  def cm(s: SparkSession, dir: String, pred: String): DataFrame = {
    val p = XFormulas.P
    TextAnalysis.withTokens(
      graft.sources.Tables(s, dir, "documents").filter(pred), "text")
      .select(explode(col("toks")).as("w"))
      .select(expr(XFormulas.sparkStrHash("w")).as("h"))
      .select(col("h"), explode(sequence(lit(0L), lit(3L))).as("r"))
      .select(col("r"), expr(
        s"((((1103515245 * r + 12345) % $p) * h + " +
          s"((1299709 * r + 7919) % $p)) % $p) % 64").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
  }
}
