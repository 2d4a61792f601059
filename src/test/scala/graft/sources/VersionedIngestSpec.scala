package graft.sources

import graft.athenaeum.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** End-to-end incremental-corpus story: each ingest batch dedups against
  * the CURRENT table version (anti join on content fingerprints — the
  * cheap exact stage; the LSH index path composes the same way, see
  * `Dedup.ingestAgainstIndex`), then commits only the survivors as a
  * new APPEND version. Every training run reads a pinned version:
  * reproducible snapshots of a corpus that never stops ingesting. */
class VersionedIngestSpec extends SparkSpec {

  test("ingest loop: dedup against latest version, append survivors, snapshots stay pinned") {
    val dir = "/root/testdata/sf0.001"
    val path = java.nio.file.Files
      .createTempDirectory("graft-vi").toString + "/corpus"
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        expr(graft.functions.XFormulas.sparkStrHash("text")).as("fp"))

    // batch 1: first 200 docs seed the corpus
    val b1 = docs.filter(col("doc_id") < 200)
    VersionedTable.commit(b1, path)
    val v1Count = VersionedTable.rowCount(spark, path, 1)

    // batch 2 arrives OVERLAPPING: 100 already-ingested docs + 100 new.
    // the ingest dedup is an anti join on the fingerprint against the
    // current version — only the genuinely new rows land in v2
    val b2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 300)
    val base1 = VersionedTable.read(spark, path).select(col("fp"))
    val fresh2 = b2.join(base1, Seq("fp"), "left_anti")
    val v2 = VersionedTable.commit(fresh2, path, mode = "append")
    assert(v2 == 2)

    // batch 3: pure duplicates — the append commits an EMPTY increment
    // and the version row count does not move
    val b3 = docs.filter(col("doc_id") < 50)
    val base2 = VersionedTable.read(spark, path).select(col("fp"))
    val fresh3 = b3.join(base2, Seq("fp"), "left_anti")
    val v3 = VersionedTable.commit(fresh3, path, mode = "append")
    assert(v3 == 3)

    // the live corpus holds every distinct fingerprint exactly once
    val live = VersionedTable.read(spark, path)
    assert(live.count() ==
      docs.filter(col("doc_id") < 300).select("fp").distinct.count())
    assert(live.groupBy("fp").count().filter(col("count") > 1).count() == 0)
    assert(VersionedTable.rowCount(spark, path, 3) == live.count())

    // time travel: the seed snapshot is untouched by two later ingests
    assert(VersionedTable.read(spark, path, Some(1)).count() == v1Count)

    // exact dedup semantics match the batch operator on the union
    val opView = Dedup.exact(
      docs.filter(col("doc_id") < 300), "doc_id", "fp")
    assert(live.count() == opView.select("fp").distinct.count())
  }
}
