package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.sources.VersionedTable

/** Streaming CUSUM changepoint monitoring: each micro-batch's events
  * fold into a per-(key, day) COUNT state table, and the committed
  * output is the CUSUM readout over everything streamed so far — the
  * live "where did this series shift" view, recomputed from daily
  * grain (tiny: keys × days), never from raw events.
  *
  * The readout IS `Events.cusumFromDaily`, the same transition the
  * batch operator uses — so every committed output version provably
  * equals `Events.cusumDaily` over the stream's prefix
  * (`ChangepointGateSpec` asserts it batch by batch).
  *
  * State is a [[MergeState]] — the same delta/bucketed layout as every
  * other gate (this was the last merge-overwrite state path): each
  * batch appends only its own (key, day, n) daily-count rows, bucketed
  * by `keyCol` at rest, and the logical state is the exchange-free
  * sum-merge on read (daily counts are a CRDT-style sum; the
  * aggregation's (key, day) grouping lands on the at-rest
  * HashPartitioning(key) — subset-key reuse holds for aggregations).
  * Per-batch state WRITE is therefore increment-sized even though this
  * gate's state is bounded by construction (keys × days, not corpus
  * bytes); tiered compaction bounds the live run count over a
  * months-long stream.
  *
  * Exactly-once rides [[GateKit]]: the output commit is the batch's
  * completion marker ([[GateKit.runOnce]]); the batch's daily-count
  * DELTA appends before it, idempotent per batch id
  * ([[MergeState.appendDelta]]) — a crash between the two replays the
  * batch, finds the delta committed, reuses it verbatim instead of
  * double-counting — and the readout derives from the committed state
  * bytes ([[MergeState.readMerged]] at the batch's own id reads
  * identically on first run and replay). */
object ChangepointGate {

  /** `events.writeStream.foreachBatch(ChangepointGate.sink(...))`;
    * events need `ts` (epoch-nanos long) and `keyCol`.
    * `retainBatches`: optional retention horizon forwarded to
    * [[MergeState.compactIfDue]] — on an unbounded stream the daily
    * counts then plateau at O(horizon) instead of growing with stream
    * age (the CUSUM readout becomes "over the retained window", the
    * usual monitoring contract). Default unbounded. */
  def sink(statePath: String, outPath: String, keyCol: String,
      nBuckets: Int = 32, compactEvery: Int = 8,
      retainBatches: Option[Long] = None)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      // fold old runs first — never the batch's own replayable delta
      MergeState.compactIfDue(spark, statePath, batchId,
        Seq(keyCol, "day"), Seq("n"), compactEvery, retainBatches)
      val inc = Events.dailyCounts(batch, keyCol)
        .select(col(keyCol), col("day"), col("n"))
      MergeState.appendDelta(inc, statePath, batchId, keyCol, nBuckets)
      // judge from the post-merge state (the batch's own counts
      // included), identical on first run and replay
      val state = MergeState.readMerged(spark, statePath, batchId,
        Seq(keyCol, "day"), Seq("n")).get
      VersionedTable.streamingCommit(
        Events.cusumFromDaily(state, keyCol), batchId, outPath,
        "overwrite")
    }
  }

  /** FORGET keys — takedown / right-to-be-forgotten on the monitoring
    * state: appends the NEGATION of the keys' entire merged daily-count
    * history as a retraction delta ([[MergeState.retractDelta]] — the
    * additive CRDT cancels exactly, and the all-zero filter then serves
    * the keys as absence), exactly once per `forgetId`. Run at a quiet
    * stream boundary (the maintenance lease fails a racing stream
    * fast); the next batch's committed readout — and [[readout]]
    * immediately — then equals the CUSUM over the stream minus the
    * forgotten keys' events. */
  def forget(spark: org.apache.spark.sql.SparkSession, statePath: String,
      keyCol: String, keys: Seq[Any], forgetId: Long): Unit =
    MergeState.readMerged(spark, statePath, Long.MaxValue,
      Seq(keyCol, "day"), Seq("n")).foreach { merged =>
      val neg = merged.filter(col(keyCol).isin(keys: _*))
        .select(col(keyCol), col("day"), (-col("n")).as("n"))
      MergeState.retractDelta(neg, statePath, forgetId)
    }

  /** The live CUSUM readout straight off the merged state — what the
    * next batch would commit. Lets a consumer observe a forget (or any
    * maintenance op) without waiting for the next event batch to
    * overwrite the output table. */
  def readout(spark: org.apache.spark.sql.SparkSession,
      statePath: String, keyCol: String): DataFrame =
    Events.cusumFromDaily(
      MergeState.readMerged(spark, statePath, Long.MaxValue,
        Seq(keyCol, "day"), Seq("n")).getOrElse(
        sys.error(s"no committed state at $statePath")), keyCol)
}
