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
  * is itself a [[VersionedTable]] — (segment hash, ndocs) rows, merged
  * and overwritten once per batch — so the state is a TABLE, not
  * driver or executor memory: it scales with distinct segments, never
  * with corpus bytes, and survives restarts with the stream.
  *
  * Semantics are the prefix fold of [[Dedup.boilerplateExcise]]'s
  * frequency rule: a document is judged against the corpus UP TO AND
  * INCLUDING its own batch. A segment that crosses the threshold in a
  * later batch is excised from that batch onward — earlier emitted
  * documents are not rewritten (standard ingest-time behavior; run the
  * batch operator for a retroactive pass).
  *
  * Exactly-once rides [[GateKit]]: the output commit is the batch's
  * completion marker ([[GateKit.runOnce]]), the frequency merge is
  * merge-once ([[GateKit.mergeState]]) — a replay reuses the committed
  * merge verbatim instead of double-counting — and the excision is
  * derived from the COMMITTED state bytes, so first run and replay
  * excise identically. Assumes each doc id arrives once (re-delivery
  * of a whole batch is handled by the batch-id guard).
  *
  * Scale: the frequency pass ships 64-bit hashes only; the overwrite
  * rewrite of the state table is O(distinct segments) per batch — the
  * compaction-free tradeoff, acceptable while state fits a table scan
  * (at larger scale, partition the state by hash range and rewrite
  * only touched partitions). */
object BoilerplateGate {

  /** `docs.writeStream.foreachBatch(BoilerplateGate.sink(...))`. */
  def sink(freqPath: String, outPath: String, idCol: String,
      textCol: String, chunkTokens: Int = 10, minDocs: Int = 3)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      import spark.implicits._
      // persist: chunks feed the frequency merge AND the reassembly
      val ch = Dedup.persistTracked(
        Dedup.chunkSegments(batch, idCol, textCol, chunkTokens))
      // judge against post-merge state: the batch's own docs count
      // toward the threshold, matching the batch operator's rule on the
      // prefix corpus
      val state = GateKit.mergeState(spark, freqPath, batchId) { base =>
        val counts = ch
          .select(col(idCol), GraftFunctions.polyHash(col("chunk")).as("h"))
          .groupBy(col("h"))
          .agg(countDistinct(col(idCol)).as("ndocs"))
        base.getOrElse(Seq.empty[(Long, Long)].toDF("h", "ndocs"))
          .select(col("h"), col("ndocs")).unionByName(counts)
          .groupBy(col("h")).agg(sum(col("ndocs")).as("ndocs"))
      }
      val boiler = state.filter(col("ndocs") >= minDocs).select(col("h"))
      val out = Dedup.exciseByHashes(ch, idCol, boiler)
      VersionedTable.streamingCommit(out, batchId, outPath, "append")
    }
  }
}
