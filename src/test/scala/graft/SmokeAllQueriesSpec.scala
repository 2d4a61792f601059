package graft

import graft.athenaeum.SparkSpec

/** Executes EVERY SparkEntry query end-to-end on sf0.001 — the cheap
  * tripwire that keeps `sbt test` sufficient to catch a runtime break
  * (ANSI overflow, divide-by-zero on a degenerate group, a renamed
  * column) without waiting for the driver's sf0.01 correctness sweep.
  * PlanHygieneSpec only plans; this one runs.
  */
class SmokeAllQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("every query executes at sf0.001 (no runtime failures)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
        finally graft.operators.Dedup.releaseCaches()
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
