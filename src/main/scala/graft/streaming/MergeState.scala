package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.BucketedState.Fold

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
  * of the live runs, computed ON READ by a groupBy that is
  * EXCHANGE-FREE: the bucketed scan reports `HashPartitioning(key, n)`,
  * so partial and final aggregation both land on the at-rest
  * partitioning and no state byte ever moves through a shuffle
  * (`GatePlanAuditSpec` pins the plan shape). The additive merge is
  * what makes deltas trivially correct: sum over any partition of the
  * batches equals sum over the whole.
  *
  * Read amplification is bounded by SIZE-TIERED (LSM-style) COMPACTION.
  * Runs live in geometric LEVELS: level 0 is the raw per-batch deltas;
  * when `compactEvery` runs accumulate at a level, the OLDEST
  * `compactEvery` of them fold into ONE run at the next level (a
  * sum-merge of just those runs), cascading upward when a level fills.
  * Each fold therefore writes only its own inputs' merged content —
  * bounded by the folded runs' size, NEVER the total state
  * (`MergeStatePinSpec` asserts it executably; the round-9
  * fold-everything-into-one-base layout wrote O(total state) per fold,
  * every `compactEvery` batches, an amortized per-batch cost that GREW
  * with the corpus and fails that pin). Amortized compaction cost is
  * O(increment × log(state/increment)) per batch; live runs stay
  * ≤ compactEvery × levels, so the read-side merge scans a bounded run
  * count forever.
  *
  * Crash consistency per fold rides one marker (`cmp-<level>-<lo>-<hi>`
  * — [[BucketedState.Fold]]):
  *
  *  - crash after the fold's write, before its marker: the new run's
  *    partition is unmarked — every reader derives its readable set
  *    from MARKERS, so the debris is invisible, and the next
  *    compaction pass deletes it before refolding;
  *  - crash after the marker, before the input drops: readers prefer
  *    the covering fold (a marked run strictly containing another
  *    marked run's range supersedes it; covered level-0 deltas are
  *    excluded by the fold prefix), and the next pass finishes the
  *    drops idempotently.
  *
  * Folds always take the OLDEST runs of a level, so the folded region
  * is a PREFIX of the batch-id space: the readable set at batch b is
  * the live folds plus the unfolded deltas in (maxFoldedHi, b] — one
  * partition-pruned predicate. Compaction folds only batches
  * ≤ batchId−1 — all committed and past replay reach (foreachBatch
  * replays at most the current batch) — so the current batch's own
  * replayable delta is never folded. Level-0 batch markers are append
  * idempotence and are never deleted; coverage is range-based. */
object MergeState {

  /** Append the batch's delta rows exactly once (idempotent per batch
    * id — a replay that finds the marker is a no-op, so a
    * deterministic delta can never double-count). */
  def appendDelta(df: DataFrame, path: String, batchId: Long,
      bucketCol: String, nBuckets: Int,
      prePartitioned: Boolean = false): Unit =
    BucketedState.appendOnce(df, path, batchId, bucketCol, nBuckets,
      prePartitioned)

  /** Marked folds that no other marked fold strictly covers — the
    * preferred run per region. (Strict containment: a fold's inputs
    * are ≥ 2 whole runs, so a covering fold's range is always strictly
    * larger; bounded count, so the quadratic scan is over dozens.) */
  private def liveFolds(all: Seq[Fold]): Seq[Fold] =
    all.filterNot(a => all.exists(b =>
      b.start <= a.start && a.hi <= b.hi &&
        (b.start < a.start || a.hi < b.hi)))

  /** The folded prefix's upper bound (−1 when nothing folded). */
  private def foldedThrough(folds: Seq[Fold]): Long =
    folds.map(_.hi).foldLeft(-1L)(math.max)

  /** Readable-run predicate at `batchId`: live folds plus unfolded
    * level-0 deltas in (foldedThrough, batchId]. */
  private def readablePred(folds: Seq[Fold], batchId: Long): Column = {
    val h = foldedThrough(folds)
    val deltas = col("__bt") > h && col("__bt") <= batchId
    if (folds.isEmpty) deltas
    else deltas || col("__bt").isin(folds.map(_.id): _*)
  }

  private def readable(spark: SparkSession, path: String,
      batchId: Long): Option[DataFrame] =
    BucketedState.readRaw(spark, path).map { raw =>
      val folds = liveFolds(BucketedState.foldMarkers(spark, path))
      raw.filter(readablePred(folds, batchId)).drop("__bt")
    }

  private def sumMerge(runs: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    runs.groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)

  /** The merged state as of batch `batchId` (the batch's own delta
    * included — merge-state gates judge post-merge): sum-merge of
    * `sumCols` grouped by `keyCols`, exchange-free over the bucketed
    * scan. None until a first delta has committed. */
  def readMerged(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String]): Option[DataFrame] =
    readable(spark, path, batchId).map(sumMerge(_, keyCols, sumCols))

  /** Tiered compaction over the runs at or below `batchId − 1`: at
    * each level with ≥ `compactEvery` live runs, fold the OLDEST
    * `compactEvery` into one next-level run, cascading upward; always
    * finishes any pending cleanup (superseded runs, unmarked debris)
    * first. Call at the top of the sink, before the batch's own delta
    * appends. Returns the folds performed (observability + the pin
    * spec's per-fold accounting). */
  def compactIfDue(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String],
      compactEvery: Int = 8): Seq[Fold] = {
    val fanout = math.max(2, compactEvery)
    // resolve the layout ONCE for the whole pass: every partition drop
    // below reuses it instead of re-reading sidecar + markers
    val lay = BucketedState.liveLayout(spark, path) match {
      case Some(l) => l
      case None => return Seq.empty
    }
    val marks = BucketedState.foldMarkers(spark, path)
    var live = liveFolds(marks).sortBy(_.start)
    // finish a crashed cleanup: superseded folds (marker + partition),
    // unmarked negative partitions (a fold that crashed pre-marker),
    // and level-0 partitions the fold prefix covers. Level-0 BATCH
    // markers stay — they are append idempotence, and the inventory
    // below excludes covered ids by range.
    val liveIds = live.map(_.id).toSet
    marks.filterNot(f => liveIds(f.id)).foreach { f =>
      BucketedState.dropBt(spark, path, f.id, lay)
      BucketedState.dropFoldMarker(spark, path, f)
    }
    val h0 = foldedThrough(live)
    BucketedState.btValues(spark, path, lay)
      .filter(v => (v < 0 && !liveIds(v)) || (v >= 0 && v <= h0))
      .foreach(v => BucketedState.dropBt(spark, path, v, lay))
    // level-0 inventory: committed deltas above the fold prefix,
    // strictly below the current (still-replayable) batch
    var l0 = BucketedState.committedBatches(spark, path)
      .filter(b => b > h0 && b < batchId).toSeq.sorted
      .map(b => Fold(0, b, b))
    val done = scala.collection.mutable.ArrayBuffer.empty[Fold]
    var level = 0
    var maxLevel = (live.map(_.level) :+ 1).max
    while (level <= maxLevel) {
      var runs =
        if (level == 0) l0
        else live.filter(_.level == level).sortBy(_.start)
      while (runs.length >= fanout) {
        val inputs = runs.take(fanout)
        val out = Fold(level + 1,
          inputs.map(_.start).min, inputs.map(_.hi).max)
        // debris from a crashed prior attempt at this exact output
        BucketedState.dropBt(spark, path, out.id, lay)
        val merged = sumMerge(
          BucketedState.readRaw(spark, path).get
            .filter(col("__bt").isin(inputs.map(_.id): _*))
            .drop("__bt"),
          keyCols, sumCols)
        BucketedState.writeBt(merged, path, out.id)
        BucketedState.foldMarker(spark, path, out) // the fold's commit
        inputs.foreach { f =>
          BucketedState.dropBt(spark, path, f.id, lay)
          if (f.level > 0) BucketedState.dropFoldMarker(spark, path, f)
        }
        runs = runs.drop(fanout)
        if (level == 0) l0 = runs
        live = live.filterNot(inputs.contains) :+ out
        if (out.level > maxLevel) maxLevel = out.level
        done += out
      }
      level += 1
    }
    done.toSeq
  }
}
