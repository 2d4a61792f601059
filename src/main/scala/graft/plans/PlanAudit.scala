package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Plan-hygiene instrumentation: how many times does a query's optimized
  * plan SCAN each base relation? A relation appearing N≥3 times almost
  * always means a multi-consumer subtree re-executes instead of being
  * persisted — the constant-factor waste that is disqualifying at 100 TB
  * (4× a 100 TB scan is 300 TB of wasted IO). Cached subtrees surface as
  * `InMemoryRelation` leaves, so a correctly persist-barriered fan-out
  * counts its base scan ONCE regardless of how many consumers sit above
  * the barrier.
  */
object PlanAudit {

  /** Leaf parquet scans per relation root path in the optimized logical
    * plan. `collectLeaves` stops at `InMemoryRelation`, so persisted
    * subtrees do not leak their inner scans into the count. */
  def scanCounts(df: DataFrame): Map[String, Int] =
    df.queryExecution.optimizedPlan.collectLeaves()
      .flatMap {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.map(_.getName)
          case _ => Nil
        }
        case _ => Nil
      }
      .groupBy(identity).map { case (p, xs) => p -> xs.size }

  /** Dev audit main: print every query whose plan scans some relation at
    * least `threshold` (default 3) times. Args: sfDir [threshold]. */
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val threshold = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.builder("graft-plan-audit", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val hot = scanCounts(fn(spark, sfDir)).filter(_._2 >= threshold)
        if (hot.nonEmpty)
          println(s"AUDIT $name: " + hot.toSeq.sorted.map {
            case (p, n) => s"$p x$n" }.mkString(", "))
      } catch { case e: Throwable =>
        println(s"AUDIT $name: PLAN FAILED ${e.getMessage}")
      } finally graft.operators.Dedup.releaseAll(spark)
    }
    spark.stop()
  }
}
