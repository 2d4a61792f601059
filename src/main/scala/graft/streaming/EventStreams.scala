package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch window operators in
  * [[graft.operators.Events]]: `readStream` → event-time transforms with
  * watermarks → `writeStream`. Inputs carry `ts_us` (BIGINT epoch micros,
  * matching the batch path's nanos÷1000) plus `event_type` / `user_id` /
  * `value` columns.
  *
  * Scale notes: windowed aggregations shuffle by (window, key) and keep
  * only watermark-live state; session windows use the state store's
  * session merge. Late data beyond the watermark is dropped — the
  * watermark bounds state size on an unbounded stream, which is the whole
  * difference from the batch forms.
  */
object EventStreams {

  private def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ets", timestamp_micros(col("ts_us")))

  /** Tumbling 1-hour counts per event type, 1-hour watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("wstart_s"),
        col("event_type"), col("n_events"))

  /** Sliding 1-hour windows every 30 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("wstart_s"),
        col("event_type"), col("n_events"))

  /** Session windows per user with a gap timeout — the streaming
    * equivalent of the batch gaps-and-islands in Events.sessionize. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(session_window(col("ets"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("long").as("session_start_s"),
        col("user_id"), col("n_events"))
}
