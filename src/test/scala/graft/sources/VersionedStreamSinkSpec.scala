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
}
