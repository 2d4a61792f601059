package graft.sources

import graft.athenaeum.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

case class VtRow(id: Long, payload: String)

/** Streaming → versioned-table sink: every micro-batch commits as one
  * append version; replayed batch ids (foreachBatch re-delivery after
  * recovery) are skipped via the in-manifest batch tag. */
class VersionedStreamSinkSpec extends SparkSpec {

  test("foreachBatch sink: one version per batch, replayed batch ids skipped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-vs").toString + "/t"
    val mem = MemoryStream[VtRow]
    val q = mem.toDS().toDF().writeStream
      .foreachBatch(VersionedTable.sink(path))
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(VtRow(1, "a"), VtRow(2, "b"))
      q.processAllAvailable()
      mem.addData(VtRow(3, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(VersionedTable.versions(spark, path) == Seq(1, 2))
    assert(VersionedTable.read(spark, path).count() == 3)
    assert(VersionedTable.committedBatches(spark, path) == Set(0L, 1L))
    // recovery replay: the same batch id must not double-commit
    val replay: DataFrame = Seq(VtRow(3, "c")).toDF()
    assert(VersionedTable.streamingCommit(replay, 1L, path).isEmpty)
    assert(VersionedTable.versions(spark, path) == Seq(1, 2))
    assert(VersionedTable.read(spark, path).count() == 3)
    // a genuinely new batch id commits
    assert(VersionedTable.streamingCommit(
      Seq(VtRow(4, "d")).toDF(), 2L, path).contains(3))
    assert(VersionedTable.read(spark, path).count() == 4)
  }

  test("sink with statCols: every micro-batch's files land with zone maps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-vss").toString + "/t"
    val mem = MemoryStream[VtRow]
    val q = mem.toDS().toDF().writeStream
      .foreachBatch(VersionedTable.sink(path, statCols = Seq("id")))
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(VtRow(10, "a"), VtRow(20, "b"))
      q.processAllAvailable()
      mem.addData(VtRow(30, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val stats = VersionedTable.fileStats(spark, path)
    assert(stats.nonEmpty && stats.forall(_.cols.contains("id")))
    val bounds = stats.flatMap(s =>
      s.cols("id").min.map(_.toLong).toSeq ++
        s.cols("id").max.map(_.toLong).toSeq)
    assert(bounds.min == 10L && bounds.max == 30L)
    // and a pruning read over the streamed table works end to end
    import org.apache.spark.sql.functions.{col, lit}
    val (keep, skip) =
      VersionedTable.pruneFiles(spark, path, col("id") >= lit(30L))
    assert(skip.nonEmpty, "the first batch's files must be skippable")
    assert(VersionedTable.readWhere(spark, path, col("id") >= lit(30L))
      .count() == 1)
  }

  test("stream-static enrichment against a PINNED snapshot ignores later commits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = java.nio.file.Files
      .createTempDirectory("graft-vd").toString + "/dim"
    // v1 dimension; v2 lands AFTER the stream starts — a pinned join
    // must keep serving v1 (reproducible enrichment: a training run
    // re-joins the exact dimension its config recorded)
    VersionedTable.commit(Seq(VtRow(1, "one_v1"), VtRow(2, "two_v1")).toDF(),
      path)
    val mem = MemoryStream[VtRow]
    val dimV1 = VersionedTable.read(spark, path, Some(1))
      .select(col("id"), col("payload").as("dim_payload"))
    val out = mem.toDS().toDF().select(col("id"), col("payload"))
      .join(dimV1, Seq("id"))
    val q = out.writeStream.format("memory").queryName("vt_enrich")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(VtRow(1, "e1"))
      q.processAllAvailable()
      // dimension moves on; the pinned stream must not see it
      VersionedTable.commit(
        Seq(VtRow(1, "one_v2"), VtRow(2, "two_v2")).toDF(), path)
      mem.addData(VtRow(2, "e2"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("vt_enrich").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    assert(rows == Set((1L, "one_v1"), (2L, "two_v1")),
      s"pinned enrichment leaked a later version: ${rows.mkString(", ")}")
    // and an UNPINNED read picks up v2 for new (batch) consumers
    assert(VersionedTable.read(spark, path)
      .filter(col("id") === 1).select("payload").head().getString(0)
      == "one_v2")
  }
}
