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
  * State is a [[VersionedTable]], not executor memory: it scales with
  * keys × days, survives restarts, and merges by ADDITION (daily
  * counts are a CRDT-style sum), so the per-batch merge is one
  * aggregation over state + increment.
  *
  * Exactly-once rides [[GateKit]]: the output commit is the batch's
  * completion marker ([[GateKit.runOnce]]), and the state merge is
  * merge-once ([[GateKit.mergeState]]) — a crash between the two
  * commits replays the batch, detects the already-merged state by its
  * batch tag, reuses the committed bytes verbatim (re-merging would
  * double-count), and re-derives the identical readout from them. */
object ChangepointGate {

  /** `events.writeStream.foreachBatch(ChangepointGate.sink(...))`;
    * events need `ts` (epoch-nanos long) and `keyCol`. */
  def sink(statePath: String, outPath: String, keyCol: String)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      val state = GateKit.mergeState(spark, statePath, batchId) { base =>
        val inc = Events.dailyCounts(batch, keyCol)
        // empty seed FROM THE INCREMENT'S OWN SCHEMA: a hardcoded
        // string-typed seed would make Union widen a non-string key to
        // string in the committed state forever, diverging from the
        // batch operator's key type
        base.getOrElse(inc.limit(0))
          .select(col(keyCol), col("day"), col("n"))
          .unionByName(inc)
          .groupBy(col(keyCol), col("day")).agg(sum(col("n")).as("n"))
      }
      VersionedTable.streamingCommit(
        Events.cusumFromDaily(state, keyCol), batchId, outPath,
        "overwrite")
    }
  }
}
