package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Event-time windowing over the `events` table (batch forms; the
  * streaming variants live in [[graft.streaming.EventStreams]]).
  *
  * The events `ts` column arrives as BIGINT epoch-nanos —
  * [[graft.sources.Tables]] normalizes whatever physical timestamp type
  * the parquet carries (INT64 nanos or TIMESTAMP micros) into that shape.
  * All window math is integer arithmetic on epoch units — deterministic
  * and identical in any engine.
  */
object Events {

  val MicrosPerHour = 3600000000L

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Tumbling 1h windows: (hour bucket, event_type) counts + value sum.
    * Buckets derive from MICROsecond epochs: DuckDB truncates the parquet
    * nanos to µs on read, so µs is the finest unit both engines agree on. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withColumn("hour_bucket", expr(s"(ts div 1000) div $MicrosPerHour"))
      .groupBy("hour_bucket", "event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))

  /** Sliding 1h windows every 30min via Spark's built-in `window()`
    * (epoch-aligned). Window start surfaces as epoch seconds. */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("ets"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("wstart_s"),
        col("event_type"), col("n_events"))

  /** Session windows per user with a max gap, batch form: classic
    * gaps-and-islands (lag + running sum). One shuffle on user_id; at
    * scale the sort within user partitions is the cost driver — this is
    * exactly what Structured Streaming's session_window state store
    * avoids by processing incrementally. */
  def sessionize(events: DataFrame, gapMicros: Long = 30L * 60 * 1000000)
      : DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    events
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        (col("prev_us").isNull || col("ts_us") - col("prev_us") > gapMicros)
          .cast("long"))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .drop("session_seq")
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"), col("total_value"))
  }
}
