package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.athenaeum.SparkSpec
import graft.sources.Tables

/** The custom top-k-per-group operator must return EXACTLY the rows (and
  * ranks) of the window + filter formulation, while planning as
  * partial/final around the exchange. */
class TopKPerGroupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def windowed(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "rn")
  }

  private def custom(k: Int) = {
    val orders = Tables(spark, dir, "orders")
    TopK.topKPerGroup(orders, Seq("o_custkey"),
      Seq(orders.col("o_totalprice").desc, orders.col("o_orderkey")), k)
      .select("o_custkey", "o_orderkey", "rn")
  }

  test("matches the window+filter formulation exactly (rows and ranks)") {
    for (k <- Seq(1, 3, 7)) {
      val a = custom(k)
      val b = windowed(k)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"k=$k diverged")
    }
  }

  test("plans as partial -> exchange -> final, no WindowExec, no full sort") {
    val plan = custom(3).queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerGroup"), plan)
    assert(plan.contains("FinalTopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning(o_custkey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("map-side pruning bounds the exchange input") {
    // 1500 orders, 1000 custkeys; with k=1 the exchange input is at most
    // (#groups per input partition) rows — observable as the partial
    // stage's output being strictly smaller than the table whenever a
    // group has >1 row in a partition. Validate semantics: each group
    // yields exactly one row with rank 1 and the group max.
    val got = custom(1)
    assert(got.filter("rn <> 1").count() == 0)
    val expected = Tables(spark, dir, "orders")
      .groupBy("o_custkey").agg(countDistinct("o_orderkey"))
    assert(got.count() == expected.count())
  }

  test("works with grouping on a derived expression input") {
    val li = Tables(spark, dir, "lineitem")
    val got = TopK.topKPerGroup(li, Seq("l_partkey"),
      Seq(li.col("l_extendedprice").desc, li.col("l_orderkey"),
        li.col("l_linenumber")), 2)
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
    val ref = li.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 2)
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }
}
