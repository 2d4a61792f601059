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
  * and the partial-failure order (frequency delta committed, output
  * not) must both be exactly-once, and the merge-state COMPACTION
  * (exercised here with compactEvery=2, so it fires mid-stream) must
  * fold delta runs without changing any judged count. */
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

  private def bannerCount(freqPath: String, batchId: Long): Seq[Long] =
    MergeState.readMerged(spark, freqPath, batchId,
        Seq("h"), Seq("ndocs")).get
      .filter(col("ndocs") >= 3).collect().map(_.getLong(1)).toSeq

  test("prefix-fold semantics across batches; replay is a no-op; no double-count on partial-failure replay; compaction preserves counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bg").toString
    val freqPath = s"$dir/freq"
    val outPath = s"$dir/out"
    val mem = MemoryStream[BgDoc]
    val snk = BoilerplateGate.sink(freqPath, outPath, "doc_id", "text",
      compactEvery = 2)
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
      // (batch 2's compactIfDue folds deltas 0-1 — compactEvery=2)
      mem.addData(BgDoc(4, banner))
      q.processAllAvailable()
    } finally q.stop()

    val got = outMap(outPath)
    assert(got(1L) == (s"$banner ${uniq("p")}", 2L, 0L))
    assert(got(2L) == (banner, 1L, 0L))
    assert(got(3L) == (uniq("u"), 1L, 1L))
    assert(got(4L) == ("", 0L, 1L))
    // state: banner counted once per distinct doc, across the
    // compacted base + the live deltas alike
    assert(bannerCount(freqPath, 2L) == Seq(4L))
    // compaction actually fired: a folded base partition exists and the
    // folded delta runs are gone
    val parts = BucketedState.btValues(spark, freqPath)
    assert(parts.exists(_ < 0), s"no compacted base among $parts")
    assert(!parts.contains(0L),
      s"folded delta partition 0 still live among $parts")
    assert(VersionedTable.versions(spark, outPath).size == 3)

    // foreachBatch replay of the last epoch: both tables unchanged
    snk(Seq(BgDoc(4, banner)).toDF(), 2L)
    assert(VersionedTable.versions(spark, outPath).size == 3)
    assert(outMap(outPath) == got)
    assert(bannerCount(freqPath, 2L) == Seq(4L))

    // partial failure: the frequency DELTA committed for batch 10, out
    // commit never happened — the replay must reuse the committed delta
    // (NOT re-append it) and emit the excised doc exactly once
    val d5 = Seq(BgDoc(5, s"$banner ${uniq("z")}")).toDF()
    val counts5 = Dedup.chunkSegments(d5, "doc_id", "text", 10)
      .select(col("doc_id"), GraftFunctions.polyHash(col("chunk")).as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("ndocs"))
    MergeState.appendDelta(counts5, freqPath, 10L, "h", 32)
    snk(d5, 10L)
    val got2 = outMap(outPath)
    assert(got2(5L) == (uniq("z"), 1L, 1L))
    // 5 distinct docs carried the banner — 6 would mean a double count
    assert(bannerCount(freqPath, 10L) == Seq(5L))

    // compaction crash window A: the new base partition was written
    // but the watermark marker was not — the folded deltas are still
    // live, the unmarked base is unreadable debris the next batch's
    // compactIfDue must discard before recompacting. Counts intact.
    val merged10 = MergeState.readMerged(spark, freqPath, 10L,
      Seq("h"), Seq("ndocs")).get
    BucketedState.writeBt(merged10, freqPath, -11L)
    snk(Seq(BgDoc(6, banner)).toDF(), 11L)
    assert(bannerCount(freqPath, 11L) == Seq(6L))
    assert(outMap(outPath)(6L) == ("", 0L, 1L))

    // compaction crash window B: a fold written AND marked, the folded
    // inputs' drops pending — readers must already prefer the covering
    // fold over its inputs, and the next batch finishes the drops
    // idempotently
    val partsB = BucketedState.btValues(spark, freqPath)
    val merged11 = MergeState.readMerged(spark, freqPath, 11L,
      Seq("h"), Seq("ndocs")).get.localCheckpoint()
    val fullFold = BucketedState.Fold(9, 0L, 11L)
    BucketedState.writeBt(merged11, freqPath, fullFold.id)
    BucketedState.foldMarker(spark, freqPath, fullFold)
    assert(bannerCount(freqPath, 11L) == Seq(6L),
      "pending drops changed the readable counts")
    snk(Seq(BgDoc(7, banner)).toDF(), 12L)
    assert(bannerCount(freqPath, 12L) == Seq(7L))
    val partsC = BucketedState.btValues(spark, freqPath)
    assert(partsB.filter(_ <= 11L).forall(v => !partsC.contains(v)),
      s"folded partitions not swept: $partsB -> $partsC")
  }
}
