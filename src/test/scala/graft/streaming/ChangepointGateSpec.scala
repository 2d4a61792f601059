package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.athenaeum.SparkSpec
import graft.operators.{Dedup, Events}
import graft.sources.VersionedTable

case class CgEvent(ts: Long, event_type: String)

/** Every committed output version of the streaming CUSUM gate must
  * equal `Events.cusumDaily` over the stream's prefix — including
  * batches that UPDATE an already-seen (key, day) cell (late events
  * merge by addition). Replay and the partial-failure order (state
  * committed, output not) must both be exactly-once. */
class ChangepointGateSpec extends SparkSpec {

  private def nanos(day: Long, j: Long) =
    day * 86400000000000L + j * 1000000000L

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val s = df.collect().map(_.toString).toSet
    Dedup.releaseAll(spark)
    s
  }

  test("each committed readout equals the batch operator on the prefix; replay and partial-failure replay are exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cg").toString
    val statePath = s"$dir/state"
    val outPath = s"$dir/out"
    val mem = MemoryStream[CgEvent]
    val snk = ChangepointGate.sink(statePath, outPath, "event_type")
    val q = mem.toDS().toDF().writeStream.foreachBatch(snk)
      .outputMode(OutputMode.Append).start()
    val b0 = Seq(CgEvent(nanos(0, 1), "A"), CgEvent(nanos(1, 1), "A"),
      CgEvent(nanos(1, 2), "A"), CgEvent(nanos(0, 1), "B"))
    val b1 = Seq(CgEvent(nanos(2, 1), "A"), CgEvent(nanos(2, 2), "A"),
      CgEvent(nanos(2, 3), "A"),
      // late event UPDATING day 0 of A — counts must merge by addition
      CgEvent(nanos(0, 2), "A"))
    var seen = Seq.empty[CgEvent]
    try {
      for (b <- Seq(b0, b1)) {
        mem.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        val expect = canon(Events.cusumDaily(
          seen.toDF("ts", "event_type"), "event_type"))
        val got = canon(VersionedTable.read(spark, outPath))
        assert(got == expect, s"streamed readout != batch prefix at ${seen.size} events")
      }
    } finally q.stop()

    assert(VersionedTable.versions(spark, outPath).size == 2)
    val got = canon(VersionedTable.read(spark, outPath))

    // replay of the last epoch: no new versions, identical bytes
    snk(b1.toDF("ts", "event_type"), 1L)
    assert(VersionedTable.versions(spark, outPath).size == 2)
    assert(canon(VersionedTable.read(spark, outPath)) == got)

    // partial failure: the batch's daily-count DELTA committed for
    // batch 7, output commit never happened — replay must reuse the
    // committed delta (NOT re-append it) and the readout must equal
    // the full prefix
    val b2 = Seq(CgEvent(nanos(3, 1), "B"), CgEvent(nanos(3, 2), "B"))
    MergeState.appendDelta(
      Events.dailyCounts(b2.toDF("ts", "event_type"), "event_type")
        .select(col("event_type"), col("day"), col("n")),
      statePath, 7L, "event_type", 32)
    snk(b2.toDF("ts", "event_type"), 7L)
    val expectAll = canon(Events.cusumDaily(
      (seen ++ b2).toDF("ts", "event_type"), "event_type"))
    assert(canon(VersionedTable.read(spark, outPath)) == expectAll,
      "partial-failure replay double-counted the state merge")
  }
}
