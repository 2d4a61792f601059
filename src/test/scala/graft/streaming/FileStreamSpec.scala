package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.athenaeum.SparkSpec
import graft.sources.Tables

/** Streaming from a file source — the production ingest path: readStream
  * over a parquet directory, event-time windowed aggregation, AvailableNow
  * trigger (bounded backfill of an unbounded pipeline). */
class FileStreamSpec extends SparkSpec {

  test("readStream over the events parquet matches the batch aggregation") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables(spark, dir, "events")
    // stage the parquet into a stream-source directory
    val src = java.nio.file.Files.createTempDirectory("evsrc").toString
    batchEvents.write.mode("overwrite").parquet(src)

    val stream = spark.readStream
      .schema(batchEvents.schema)
      .parquet(src)
      .selectExpr("ts div 1000 AS ts_us", "event_type", "user_id", "value")
    val counts = EventStreams.tumblingCounts(stream, watermark = "0 seconds")

    val q = counts.writeStream.format("memory").queryName("file_tumb")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val expected = graft.operators.Events.tumblingHourly(batchEvents)
      .selectExpr("hour_bucket * 3600 AS wstart_s", "event_type", "n_events")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = spark.table("file_tumb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // append mode: every window whose end <= final watermark emitted; the
    // final (max-ts) windows stay open, so got ⊂ expected and covers all
    // closed windows
    assert(got.nonEmpty && got.subsetOf(expected))
    val openWindows = expected.diff(got).map(_._1)
    val maxClosed = if (got.nonEmpty) got.map(_._1).max else 0L
    assert(openWindows.forall(_ >= maxClosed),
      s"non-tail windows missing: ${expected.diff(got)}")
  }
}
