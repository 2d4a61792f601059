package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Spatial
import graft.sources.VersionedTable

/** Streaming spatial proximity gate — the streaming twin of
  * [[Spatial.radiusJoin]]: every arriving point is checked for
  * neighbors within `radius` among everything seen so far (prior
  * batches AND the same batch), and the discovered pairs APPEND to a
  * persistent output table whose cumulative content provably equals
  * the one-shot batch radius join over the stream's prefix
  * (`SpatialGateSpec` asserts it batch by batch).
  *
  * Per batch: candidates = increment × stored-points (bipartite grid
  * join, [[Spatial.radiusJoinKeyed]] — the SAME cell expressions and
  * exact integer verify as the batch operator) ∪ increment × increment
  * ([[Spatial.radiusJoin]]). Pairs are canonicalized id_a < id_b, and
  * the two candidate sets are disjoint by construction (cross pairs
  * one side in the increment and one strictly before it), so the
  * appended union is exactly the prefix join's increment:
  * pairs(prefix ∪ inc) = pairs(prefix) ∪ (inc × prefix) ∪ (inc × inc).
  *
  * Point ids are expected unique across the stream; if an id already
  * in the stored state is re-delivered anyway, the id_l =!= id_r guard
  * keeps it from pairing with its own stored copy — the batch operator
  * (id_a < id_b) never emits self-pairs, so the gate must not either.
  *
  * State = the point set as a [[BucketedState]] table carrying its
  * grid cell and the packed cell key ([[Spatial.gridKeyed]]), BUCKETED
  * BY that key at rest — the cell size is frozen into the state layout
  * (a shard-function constant, like any index), and in exchange the
  * per-batch cross join streams the ENTIRE accumulated point set with
  * no exchange and no sort: only the increment (exploded to its
  * neighbor cells) shuffles, however much history has accumulated.
  * The round-7 layout re-shuffled the whole point set through every
  * batch's cell join — the pattern that cannot survive 100 TB of
  * accumulated state.
  *
  * Exactly-once rides [[GateKit]]: the output commit is the completion
  * marker ([[GateKit.runOnce]]); the state (points) commits FIRST,
  * idempotent per batch id ([[BucketedState.appendOnce]]); and a
  * replay reads the state as it stood BEFORE the batch by partition
  * pruning ([[BucketedState.readBefore]]) — joining the latest state
  * instead would pair the increment against its own replayed points
  * and double-report the intra-batch pairs as cross pairs. */
object SpatialGate {

  /** `points.writeStream.foreachBatch(SpatialGate.sink(...))`; points
    * need integer-valued `idCol`, `xCol`, `yCol`. */
  def sink(statePath: String, outPath: String, idCol: String,
      xCol: String, yCol: String, radius: Long, cell: Long,
      nBuckets: Int = 32)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, outPath, batchId) {
      // persist: the keyed projection feeds the cross probe, both sides
      // of the intra self-join, and the state commit — without the pin
      // the source micro-batch re-evaluates per consumer
      val inc = graft.operators.Dedup.persistTracked(
        Spatial.gridKeyed(batch, idCol, xCol, yCol, cell))
      // SERVED state: forgotten points are tombstone-filtered
      val cross = BucketedState.readBeforeServed(spark, statePath, batchId) match {
        case Some(base) =>
          Spatial.radiusJoinKeyed(inc, "id", "x", "y", base, radius, cell)
            // a re-delivered id must not pair with its stored copy
            .filter(col("id_l") =!= col("id_r"))
            .select(least(col("id_l"), col("id_r")).as("id_a"),
              greatest(col("id_l"), col("id_r")).as("id_b"),
              col("dist2"))
        case None =>
          import spark.implicits._
          Seq.empty[(Long, Long, Long)].toDF("id_a", "id_b", "dist2")
      }
      val intra = Spatial.radiusJoin(inc, "id", "x", "y", radius, cell)
      BucketedState.appendOnce(inc, statePath, batchId, "ck", nBuckets)
      VersionedTable.streamingCommit(cross.unionByName(intra), batchId,
        outPath, "append")
    }
  }

  /** FORGET points — takedown on the proximity state: tombstone the
    * ids exactly once per `forgetId`; the sink reads served state so a
    * forgotten point never pairs with a future arrival, [[served]]
    * excludes its already-emitted pairs, and the bytes reclaim via
    * [[BucketedState.purgeForgotten]]/rebucket like any join state. */
  def forget(spark: org.apache.spark.sql.SparkSession, statePath: String,
      ids: Seq[Long], forgetId: Long): Unit = {
    import spark.implicits._
    BucketedState.forget(spark, statePath, ids.toDF("id"), forgetId)
  }

  /** The gate's cumulative pair output SERVED through the takedown
    * tombstones. */
  def served(spark: org.apache.spark.sql.SparkSession, statePath: String,
      outPath: String): DataFrame = {
    val out = VersionedTable.read(spark, outPath)
    BucketedState.forgottenKeys(spark, statePath) match {
      case Some(t) => BucketedState.antiTomb(
        BucketedState.antiTomb(out, t, "id_a"), t, "id_b")
      case None => out
    }
  }
}
