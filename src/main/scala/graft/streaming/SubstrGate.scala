package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.VersionedTable

/** Streaming exact-substring dedup gate — the streaming twin of
  * [[Dedup.duplicatedSubstrings]]: every arriving document is checked
  * for maximal verbatim-shared spans (length ≥ minLen) against
  * everything seen so far AND against its own batch, and the
  * discovered runs APPEND to an output table whose cumulative content
  * provably equals the one-shot batch operator over the stream's
  * prefix (`SubstrGateSpec` asserts it batch by batch).
  *
  * State is TWO [[VersionedTable]]s: the document texts (id, t) — the
  * residual-verify and excise substrate — and the positional gram
  * index (id, pos, h), appended increment-sized per batch so the
  * corpus is never re-grammed. Per batch: increment grams join the
  * PINNED stored index on the 64-bit anchor hash, survivors pass the
  * exact substring-equality residual against the pinned stored texts
  * plus the batch's own, pairs orient to (min id, max id), and the
  * diagonal-runs grouping emits maximal spans; intra-batch runs come
  * from the batch operator itself. Cross and intra pair sets are
  * disjoint (one side strictly earlier vs both in the batch), and a
  * pair's gram matches all live on one side of that split, so the
  * appended union is exactly the prefix operator's increment.
  *
  * State size honesty: the gram index is ~24 bytes per character
  * position — the same order as the suffix structures exact
  * substring dedup needs in any architecture; at 100 TB it shards by
  * hash like any index table, and the per-batch cost is one
  * increment-grams-vs-index hash join, never a corpus re-scan of
  * text.
  *
  * Exactly-once: all three commits are idempotent per batch id, in
  * order grams → docs → runs (the output commit is the completion
  * marker). A replay whose gram/doc appends already landed PINS the
  * pre-batch versions ([[VersionedTable.versionOfBatch]], the
  * [[ClusterMaintainer]] discipline) — reading latest would pair the
  * increment against its own replayed grams and double-report intra
  * runs as cross runs. */
object SubstrGate {

  /** `docs.writeStream.foreachBatch(SubstrGate.sink(...))`. */
  def sink(docsPath: String, gramsPath: String, outPath: String,
      idCol: String, textCol: String, minLen: Int)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    if (!VersionedTable.committedBatches(spark, outPath)
        .contains(batchId)) {
      val inc = Dedup.persistTracked(batch.select(
        col(idCol).cast("long").as("id"), col(textCol).as("t")))
      def pinnedBefore(path: String): Option[Int] = {
        val vs = VersionedTable.versions(spark, path)
        VersionedTable.versionOfBatch(spark, path, batchId) match {
          case Some(own) => vs.filter(_ < own).lastOption
          case None => vs.lastOption
        }
      }
      val gramsV = pinnedBefore(gramsPath)
      val docsV = pinnedBefore(docsPath)
      val cross = (gramsV, docsV) match {
        case (Some(gv), Some(dv)) =>
          val incG = Dedup.gramFrame(inc, minLen)
          val baseG = VersionedTable.read(spark, gramsPath, Some(gv))
          val baseT = VersionedTable.read(spark, docsPath, Some(dv))
          // orient BEFORE the runs grouping: doc_a = min id carries pa
          val matches = Dedup.verifyGramMatches(
            baseG.select(col("h"), col("id").as("doc_a"),
                col("pos").as("pa"))
              .join(incG.select(col("h"), col("id").as("doc_b"),
                col("pos").as("pb")), Seq("h")),
            baseT, inc, minLen)
          val oriented = matches.select(
            least(col("doc_a"), col("doc_b")).as("doc_a2"),
            greatest(col("doc_a"), col("doc_b")).as("doc_b2"),
            when(col("doc_a") < col("doc_b"), col("pa"))
              .otherwise(col("pb")).as("pa2"),
            when(col("doc_a") < col("doc_b"), col("pb"))
              .otherwise(col("pa")).as("pb2"))
            .select(col("doc_a2").as("doc_a"), col("doc_b2").as("doc_b"),
              col("pa2").as("pa"), col("pb2").as("pb"))
          Dedup.maximalRuns(oriented, minLen)
        case _ =>
          import spark.implicits._
          Seq.empty[(Long, Long, Long, Long, Long)]
            .toDF("doc_a", "doc_b", "start_a", "start_b", "len")
      }
      val intra = Dedup.duplicatedSubstrings(inc, "id", "t", minLen)
      VersionedTable.streamingCommit(Dedup.gramFrame(inc, minLen),
        batchId, gramsPath, "append")
      VersionedTable.streamingCommit(inc, batchId, docsPath, "append")
      VersionedTable.streamingCommit(cross.unionByName(intra), batchId,
        outPath, "append")
      Dedup.releaseCaches()
    }
  }
}
