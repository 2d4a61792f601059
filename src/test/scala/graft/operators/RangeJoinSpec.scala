package graft.operators

import org.apache.spark.sql.functions._
import graft.athenaeum.SparkSpec
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed range join equals the naive theta join") {
    val li = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val part = Tables(spark, dir, "part").select("p_partkey", "p_size")
    val naive = li.join(part,
        abs(col("l_quantity") - col("p_size")) <= 2)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    val bucketed = RangeJoin.bucketed(li, "l_quantity", part, "p_size", 2.0)
      .select("l_orderkey", "l_linenumber", "p_partkey")
    assert(bucketed.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(bucketed).count() == 0)
  }

  test("optimizer rule: naive abs-tolerance join auto-plans as equi join") {
    RangeJoin.enableAuto(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val part = Tables(spark, dir, "part").select("p_partkey", "p_size")
      val naive = li.join(part,
        abs(col("l_quantity") - col("p_size")) <= 2)
      val plan = naive.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(2000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // schema is untouched by the rewrite (bucket columns projected away)
      assert(naive.columns.toSeq ==
        Seq("l_orderkey", "l_linenumber", "l_quantity", "p_partkey", "p_size"))
      // and results match the manual bucketed form exactly
      val manual = RangeJoin.bucketed(li, "l_quantity", part, "p_size", 2.0)
        .select(naive.columns.map(col).toIndexedSeq: _*)
      assert(naive.exceptAll(manual).count() == 0)
      assert(manual.exceptAll(naive).count() == 0)
      // flipped orientation (lit >= abs) and reversed operand order too
      val flipped = part.join(li,
        lit(2) >= abs(col("p_size") - col("l_quantity")))
      val fplan = flipped.queryExecution.executedPlan.toString
      assert(!fplan.contains("BroadcastNestedLoopJoin") &&
        !fplan.contains("CartesianProduct"), fplan.take(2000))
      assert(flipped.count() == naive.count())
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("bucketed form avoids the nested loop even without broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, dir, "lineitem")
      val part = Tables(spark, dir, "part")
      val plan = RangeJoin.bucketed(li, "l_quantity", part, "p_size", 2.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(2000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
