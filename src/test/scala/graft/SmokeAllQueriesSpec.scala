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

  test("no duplicate query keys in the SparkEntry source") {
    // Map literals silently keep the LAST duplicate key — a re-added
    // name would shadow an existing query in both maps and the oracle
    // sweep would still pass (against the wrong query). Count each
    // `"q..." ->` key in the source: exactly once per map, so exactly
    // twice overall (queries + oracleSql).
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")))
    val key = """"(q[0-9a-z_]+)"\s*->""".r
    val counts = key.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 != 2).toSeq.sortBy(_._1)
    assert(dups.isEmpty,
      s"keys not appearing exactly twice (queries + oracleSql): $dups")
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
