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

  /** Offline CUSUM changepoint readout per key over daily event counts:
    * dev_fx(d) = D·Σ_{i≤d}(n_i) − idx(d)·Σ(n_i), the cumulative
    * deviation from the key's mean SCALED BY its day count D — so the
    * classic CUSUM statistic Σ(n_i − μ) stays in exact BIGINT
    * arithmetic instead of a float μ (order-independent, engine-exact —
    * the same fixed-point discipline as the PageRank/RA scores). The
    * most likely changepoint is the |dev| peak (`is_peak`; ties flag
    * every argmax, keeping the output a pure function of the data).
    *
    * Scale shape: one aggregation to daily grain — the windows then run
    * over KEY×DAY rows (thousands per key), not events, partitioned by
    * key; nothing global, nothing proportional to raw event volume. */
  def cusumDaily(events: DataFrame, keyCol: String): DataFrame =
    cusumFromDaily(dailyCounts(events, keyCol), keyCol)

  /** (key, day, n) daily grain — the state a streaming maintainer
    * accumulates incrementally (counts merge by addition). */
  def dailyCounts(events: DataFrame, keyCol: String): DataFrame = {
    val microsPerDay = 86400000000L
    events
      .withColumn("day", expr(s"(ts div 1000) div $microsPerDay"))
      .groupBy(col(keyCol), col("day"))
      .agg(count(lit(1)).as("n"))
  }

  /** The CUSUM readout from daily-grain counts — shared verbatim by
    * the batch operator and `streaming/ChangepointGate`, so streamed
    * state provably yields the batch answer. */
  def cusumFromDaily(daily: DataFrame, keyCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val ordered = Window.partitionBy(keyCol).orderBy("day")
    daily
      .withColumn("dd", count(lit(1)).over(byKey))
      .withColumn("total", sum(col("n")).over(byKey))
      .withColumn("cum", sum(col("n")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(ordered).cast("long"))
      .withColumn("dev_fx",
        col("dd") * col("cum") - col("idx") * col("total"))
      .withColumn("is_peak",
        abs(col("dev_fx")) === max(abs(col("dev_fx"))).over(byKey))
      .select(col(keyCol), col("day"), col("n"), col("dev_fx"),
        col("is_peak"))
  }
}
