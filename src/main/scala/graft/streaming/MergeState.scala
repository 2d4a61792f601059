package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-state for streaming gates whose state is an additive CRDT —
  * the aggregate-state sibling of [[BucketedState]]. A gate like
  * [[BoilerplateGate]] keeps (key, count) frequency rows; the old
  * layout merged the increment into the whole accumulated table and
  * REWROTE it every batch — O(distinct keys seen so far) of write per
  * batch, the exact full-state-per-batch shape [[BucketedState]]
  * eliminated from the join-state gates, still scaling with the corpus.
  *
  * Here the state at rest is a [[BucketedState]] table of DELTAS:
  * each batch appends only its own (key, count) rows — increment-sized
  * write, bucketed by `key` — and the logical state is the sum-merge
  * of the base plus all deltas, computed ON READ by a groupBy that is
  * EXCHANGE-FREE: the bucketed scan reports `HashPartitioning(key, n)`,
  * so partial and final aggregation both land on the at-rest
  * partitioning and no state byte ever moves through a shuffle. The
  * additive merge is what makes deltas trivially correct: sum over any
  * partition of the batches equals sum over the whole.
  *
  * Read amplification is bounded by LSM-style COMPACTION: when the
  * number of live runs (delta partitions + base) reaches
  * `compactEvery`, the merged state is rewritten as a single BASE
  * partition (`__bt = -(T+1)` — the negative id space is compaction's;
  * appends own the non-negative ids) and the folded partitions drop.
  * One compaction is O(live distinct keys) but runs every
  * `compactEvery` batches, off the per-batch write path — per-batch
  * cost stays increment-sized (`ShuffleBudgetSpec` pins it), and the
  * watermark `cmp-T` marker makes it crash-safe:
  *
  *  - crash after the base write, before the marker: the new base
  *    partition is registered but every reader's predicate excludes it
  *    (only the MARKED base is readable), and the retry deletes and
  *    rewrites it;
  *  - crash after the marker, before the drops: readers already see
  *    exactly the new base + newer deltas (folded partitions are
  *    excluded by the watermark predicate); the next call finishes the
  *    drops idempotently.
  *
  * Compaction folds only batches ≤ T = batchId−1 — all committed and
  * past replay reach (foreachBatch replays at most the current batch)
  * — so replay pinning never needs finer granularity than the
  * watermark provides. The current batch's own delta is never folded
  * while it can still replay. */
object MergeState {

  /** Append the batch's delta rows exactly once (idempotent per batch
    * id — a replay that finds the marker is a no-op, so a
    * deterministic delta can never double-count). */
  def appendDelta(df: DataFrame, path: String, batchId: Long,
      bucketCol: String, nBuckets: Int,
      prePartitioned: Boolean = false): Unit =
    BucketedState.appendOnce(df, path, batchId, bucketCol, nBuckets,
      prePartitioned)

  /** Readable runs at `batchId`: the marked base (if any) plus deltas
    * after the watermark up to and including the batch's own. */
  private def readable(spark: SparkSession, path: String,
      batchId: Long): Option[DataFrame] =
    BucketedState.readRaw(spark, path).map { raw =>
      val t = BucketedState.compactedThrough(spark, path)
      val pred =
        if (t >= 0)
          col("__bt") === lit(-(t + 1)) ||
            (col("__bt") > t && col("__bt") <= batchId)
        else col("__bt") >= 0 && col("__bt") <= batchId
      raw.filter(pred).drop("__bt")
    }

  /** The merged state as of batch `batchId` (the batch's own delta
    * included — merge-state gates judge post-merge): sum-merge of
    * `sumCols` grouped by `keyCols`, exchange-free over the bucketed
    * scan. None until a first delta has committed. */
  def readMerged(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String]): Option[DataFrame] =
    readable(spark, path, batchId).map { runs =>
      runs.groupBy(keyCols.map(col): _*)
        .agg(sum(col(sumCols.head)).as(sumCols.head),
          sumCols.tail.map(c => sum(col(c)).as(c)): _*)
    }

  /** Fold the runs at or below T = `batchId − 1` into a single base
    * partition when `compactEvery` live runs have accumulated; always
    * finishes any pending post-watermark drops first. Call at the top
    * of the sink, before the batch's own delta appends. */
  def compactIfDue(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String],
      compactEvery: Int = 8): Unit = {
    // resolve the layout ONCE for the whole pass: every partition drop
    // below reuses it instead of re-reading sidecar + markers
    val lay = BucketedState.liveLayout(spark, path) match {
      case Some(l) => l
      case None => return
    }
    val t0 = BucketedState.compactedThrough(spark, path)
    val parts = BucketedState.btValues(spark, path, lay)
    // finish a crashed cleanup: folded deltas (≤ watermark) and
    // superseded bases are unreadable already — drop them
    parts.filter(v => (v >= 0 && v <= t0) || (v < 0 && v != -(t0 + 1)))
      .foreach(v => BucketedState.dropBt(spark, path, v, lay))
    val tNew = batchId - 1
    if (tNew <= t0) return
    val live = parts.count(v => (v > t0 && v <= tNew) || v == -(t0 + 1))
    if (live < compactEvery) return
    // debris from a crashed prior attempt at this watermark
    BucketedState.dropBt(spark, path, -(tNew + 1), lay)
    val merged = readMerged(spark, path, tNew, keyCols, sumCols).get
    BucketedState.writeBt(merged, path, -(tNew + 1))
    BucketedState.compactionMarker(spark, path, tNew)
    parts.filter(v => (v >= 0 && v <= tNew) || v == -(t0 + 1))
      .foreach(v => BucketedState.dropBt(spark, path, v, lay))
    // keep the markers dir bounded: batch markers + ONE cmp watermark
    BucketedState.sweepCompactionMarkers(spark, path)
  }
}
