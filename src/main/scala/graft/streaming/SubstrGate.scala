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
  * Doc ids are expected unique across the stream; if an id already in
  * the stored state is re-delivered in a later batch anyway, the
  * doc_a =!= doc_b guard below keeps it from pairing with its own
  * stored copy — the batch operator (doc_a < doc_b) never emits
  * self-pairs, so the gate must not either.
  *
  * State size honesty: the gram index is ~24 bytes per character
  * position — the same order as the suffix structures exact
  * substring dedup needs in any architecture; at 100 TB it shards by
  * hash like any index table, and the per-batch cost is one
  * increment-grams-vs-index hash join, never a corpus re-scan of
  * text.
  *
  * Exactly-once rides [[GateKit]]: the output commit is the completion
  * marker ([[GateKit.runOnce]]); commits land in order grams → docs →
  * runs, each idempotent per batch id; and a replay whose gram/doc
  * appends already landed PINS the pre-batch versions
  * ([[GateKit.pinnedBefore]]) — reading latest would pair the
  * increment against its own replayed grams and double-report intra
  * runs as cross runs. */
object SubstrGate {

  /** `docs.writeStream.foreachBatch(SubstrGate.sink(...))`. */
  def sink(docsPath: String, gramsPath: String, outPath: String,
      idCol: String, textCol: String, minLen: Int)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      val inc = Dedup.persistTracked(batch.select(
        col(idCol).cast("long").as("id"), col(textCol).as("t")))
      val cross = (GateKit.readPinnedBefore(spark, gramsPath, batchId),
          GateKit.readPinnedBefore(spark, docsPath, batchId)) match {
        case (Some(baseG), Some(baseT)) =>
          val incG = Dedup.gramFrame(inc, minLen)
          // orient BEFORE the runs grouping: doc_a = min id carries pa
          val matches = Dedup.verifyGramMatches(
            baseG.select(col("h"), col("id").as("doc_a"),
                col("pos").as("pa"))
              .join(incG.select(col("h"), col("id").as("doc_b"),
                col("pos").as("pb")), Seq("h"))
              // a re-delivered id must not pair with its stored copy
              .filter(col("doc_a") =!= col("doc_b")),
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
    }
  }
}
