package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Dedup
import graft.sources.VersionedTable

/** Streaming boilerplate excision at INGEST time: each micro-batch's
  * documents are stripped of every segment that is corpus boilerplate
  * *as of everything streamed so far* (cumulative doc-frequency >=
  * `minDocs`), then appended to the output table. The frequency state
  * is a [[MergeState]] — (segment hash, ndocs) DELTA rows bucketed by
  * the hash at rest — so the state is a TABLE, not driver or executor
  * memory: it scales with distinct segments, never with corpus bytes,
  * and survives restarts with the stream.
  *
  * Semantics are the prefix fold of [[Dedup.boilerplateExcise]]'s
  * frequency rule: a document is judged against the corpus UP TO AND
  * INCLUDING its own batch. A segment that crosses the threshold in a
  * later batch is excised from that batch onward — earlier emitted
  * documents are not rewritten (standard ingest-time behavior; run the
  * batch operator for a retroactive pass).
  *
  * Exactly-once: the output commit is the batch's completion marker
  * ([[GateKit.runOnce]]); the batch's frequency DELTA appends before
  * it, idempotent per batch id ([[MergeState.appendDelta]]) — a replay
  * that finds the delta committed reuses it verbatim instead of
  * double-counting — and the excision is derived from the committed
  * state bytes ([[MergeState.readMerged]] at the batch's own id reads
  * identically on first run and replay), so both excise identically.
  * Assumes each doc id arrives once (re-delivery of a whole batch is
  * handled by the batch-id guard).
  *
  * Scale: the frequency pass ships 64-bit hashes only; the per-batch
  * STATE WRITE is the increment's distinct segments — never the
  * accumulated table (`ShuffleBudgetSpec` pins it executably; the old
  * merge-and-overwrite layout rewrote O(corpus distinct segments) per
  * batch and fails that assertion) — and the read-side merge is an
  * exchange-free aggregation over the bucketed delta scan, compacted
  * every `compactEvery` batches off the per-batch write path. */
object BoilerplateGate {

  /** `docs.writeStream.foreachBatch(BoilerplateGate.sink(...))`.
    * `retainBatches`: optional retention horizon forwarded to
    * [[MergeState.compactIfDue]] — frequency state then plateaus at
    * O(horizon) on an unbounded stream (boilerplate becomes "frequent
    * within the retained window", the usual drift-tolerant contract)
    * instead of growing with every distinct segment ever seen. */
  def sink(freqPath: String, outPath: String, idCol: String,
      textCol: String, chunkTokens: Int = 10, minDocs: Int = 3,
      nBuckets: Int = 32, compactEvery: Int = 8,
      retainBatches: Option[Long] = None)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      // fold old runs first — never the batch's own replayable delta
      MergeState.compactIfDue(spark, freqPath, batchId,
        Seq("h"), Seq("ndocs"), compactEvery, retainBatches)
      // persist: chunks feed the frequency delta AND the reassembly
      val ch = Dedup.persistTracked(
        Dedup.chunkSegments(batch, idCol, textCol, chunkTokens))
      val counts = ch
        .select(col(idCol), GraftFunctions.polyHash(col("chunk")).as("h"))
        .groupBy(col("h"))
        .agg(countDistinct(col(idCol)).as("ndocs"))
      MergeState.appendDelta(counts, freqPath, batchId, "h", nBuckets)
      // judge against the post-merge state: the batch's own docs count
      // toward the threshold, matching the batch operator's rule on the
      // prefix corpus
      val state = MergeState.readMerged(spark, freqPath, batchId,
        Seq("h"), Seq("ndocs")).get
      val boiler = state.filter(col("ndocs") >= minDocs).select(col("h"))
      val out = Dedup.exciseByHashes(ch, idCol, boiler)
      VersionedTable.streamingCommit(out, batchId, outPath, "append")
    }
  }

  /** FORGET documents from the frequency state — the DOC-LEVEL
    * retraction (finer than a key tombstone: a forgotten doc
    * DECREMENTS each of its segments' doc-frequency rather than
    * killing the segment for everyone). `docs` must carry the
    * forgotten documents' original id + text (the takedown caller has
    * them by definition); their per-hash contributions — one per
    * (doc, distinct chunk), exactly what the sink's deltas counted —
    * are negated and appended as a retraction run, exactly once per
    * `forgetId`. Segments whose whole support was forgotten drop to
    * zero and serve as absence; partially-supported segments keep the
    * remaining docs' counts, so a threshold crossing contributed only
    * by retracted docs un-crosses for all FUTURE batches (already-
    * emitted documents are not rewritten — same ingest-time contract
    * as the sink itself; run the batch operator for a retroactive
    * pass). */
  def forget(spark: org.apache.spark.sql.SparkSession, freqPath: String,
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 10, forgetId: Long): Unit = {
    val ch = Dedup.chunkSegments(docs, idCol, textCol, chunkTokens)
    val neg = ch
      .select(col(idCol), GraftFunctions.polyHash(col("chunk")).as("h"))
      .groupBy(col("h"))
      .agg((-countDistinct(col(idCol))).as("ndocs"))
    MergeState.retractDelta(neg, freqPath, forgetId)
  }
}
