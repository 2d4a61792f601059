package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.athenaeum.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.Dedup
import graft.sources.VersionedTable

case class BgDoc(doc_id: Long, text: String)

/** The streaming boilerplate gate must implement the PREFIX fold of the
  * batch frequency rule: each batch's docs are judged against the
  * cumulative corpus up to and including their own batch — a banner
  * below threshold passes through, the batch that pushes it to the
  * threshold gets it excised, earlier outputs stay as emitted. Replay
  * and the partial-failure order (frequency committed, output not)
  * must both be exactly-once. */
class BoilerplateGateSpec extends SparkSpec {

  private val banner = (1 to 10).map(i => s"b$i").mkString(" ")
  private def uniq(tag: String) =
    (1 to 10).map(i => s"$tag$i").mkString(" ")

  private def outMap(path: String): Map[Long, (String, Long, Long)] = {
    val m = VersionedTable.read(spark, path).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    Dedup.releaseAll(spark)
    m
  }

  test("prefix-fold semantics across batches; replay is a no-op; no double-count on partial-failure replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bg").toString
    val freqPath = s"$dir/freq"
    val outPath = s"$dir/out"
    val mem = MemoryStream[BgDoc]
    val snk = BoilerplateGate.sink(freqPath, outPath, "doc_id", "text")
    val q = mem.toDS().toDF().writeStream.foreachBatch(snk)
      .outputMode(OutputMode.Append).start()
    try {
      // batch 0: banner seen in 2 docs — below minDocs=3, passes through
      mem.addData(BgDoc(1, s"$banner ${uniq("p")}"), BgDoc(2, banner))
      q.processAllAvailable()
      // batch 1: third distinct doc pushes the banner to the threshold —
      // excised from doc 3, docs 1-2 keep their already-emitted text
      mem.addData(BgDoc(3, s"$banner ${uniq("u")}"))
      q.processAllAvailable()
      // batch 2: banner-only doc survives with empty clean_text
      mem.addData(BgDoc(4, banner))
      q.processAllAvailable()
    } finally q.stop()

    val got = outMap(outPath)
    assert(got(1L) == (s"$banner ${uniq("p")}", 2L, 0L))
    assert(got(2L) == (banner, 1L, 0L))
    assert(got(3L) == (uniq("u"), 1L, 1L))
    assert(got(4L) == ("", 0L, 1L))
    // state: banner counted once per distinct doc
    val freq = VersionedTable.read(spark, freqPath)
      .filter(col("ndocs") >= 3).collect()
    assert(freq.length == 1 && freq.head.getLong(1) == 4L)
    assert(VersionedTable.versions(spark, outPath).size == 3)

    // foreachBatch replay of the last epoch: both tables unchanged
    snk(Seq(BgDoc(4, banner)).toDF(), 2L)
    assert(VersionedTable.versions(spark, outPath).size == 3)
    assert(outMap(outPath) == got)

    // partial failure: frequency merged and committed for batch 10, out
    // commit never happened — the replay must reuse the committed merge
    // (NOT re-add the batch) and emit the excised doc exactly once
    val d5 = Seq(BgDoc(5, s"$banner ${uniq("z")}")).toDF()
    val counts5 = Dedup.chunkSegments(d5, "doc_id", "text", 10)
      .select(col("doc_id"), GraftFunctions.polyHash(col("chunk")).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("ndocs"))
    val merged5 = VersionedTable.read(spark, freqPath)
      .select(col("h"), col("ndocs")).unionByName(counts5)
      .groupBy(col("h")).agg(sum(col("ndocs")).as("ndocs"))
    VersionedTable.streamingCommit(merged5, 10L, freqPath, "overwrite")
    snk(d5, 10L)
    val got2 = outMap(outPath)
    assert(got2(5L) == (uniq("z"), 1L, 1L))
    val bannerRow = VersionedTable.read(spark, freqPath)
      .filter(col("ndocs") >= 3).collect()
    // 5 distinct docs carried the banner — 6 would mean a double count
    assert(bannerRow.length == 1 && bannerRow.head.getLong(1) == 5L)
  }
}
