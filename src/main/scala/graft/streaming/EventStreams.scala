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

  /** Stream-stream inner join within a time bound: pairs events from two
    * streams for the same user at most `boundSeconds` apart. Both sides
    * carry watermarks, and the time-bound condition lets Spark evict
    * buffered rows once the other side's watermark passes — without the
    * bound (or the watermarks) state grows forever. */
  def correlate(left: DataFrame, right: DataFrame,
      boundSeconds: Long = 1800, watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val l = withEventTime(left).withWatermark("ets", watermark)
      .select(col("user_id").as("l_user"), col("ets").as("l_ets"),
        col("event_type").as("l_type"))
    val r = withEventTime(right).withWatermark("ets", watermark)
      .select(col("user_id").as("r_user"), col("ets").as("r_ets"),
        col("event_type").as("r_type"))
    l.join(r, expr(
      s"""l_user = r_user AND
          r_ets BETWEEN l_ets AND l_ets + INTERVAL $boundSeconds SECONDS"""))
  }

  /** Stream-static enrichment: join the stream against a batch dimension
    * table. The static side is broadcast per micro-batch (no state, no
    * watermark needed on it) — the standard pattern for attaching slowly-
    * changing reference data to an event stream at scale. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      col(streamKey) === col(dimKey), "left")

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
