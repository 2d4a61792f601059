package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.BucketedState.{Fold, Rt}

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
  * sum-merge of just those runs). Each fold therefore writes only its
  * own inputs' merged content — bounded by the folded runs' size,
  * NEVER the total state (`MergeStatePinSpec` asserts it executably;
  * the round-9 fold-everything-into-one-base layout wrote O(total
  * state) per fold, every `compactEvery` batches, an amortized
  * per-batch cost that GREW with the corpus and fails that pin).
  * AT MOST ONE FOLD RUNS PER INVOCATION — the lowest due level first —
  * so the worst-case single batch pays one level's fold, never a
  * cascade climbing several levels in one call (the classic LSM write
  * stall; round 10's cascade made one batch in the 30× probe pay
  * L1+L2+L3 back to back). The backlog self-drains: level L becomes
  * due once per `fanout^(L+1)` batches, so the total due-rate is
  * Σ fanout^-(L+1) ≤ 1 fold per batch for any fanout ≥ 2, and live
  * runs per level stay bounded by `fanout + levels`. Amortized
  * compaction cost is O(increment × log(state/increment)) per batch;
  * live runs stay ≤ about compactEvery × levels, so the read-side
  * merge scans a bounded run count forever.
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
  * idempotence and are never deleted; coverage is range-based.
  *
  * RETRACTION (the CRDT forget): [[retractDelta]] appends NEGATED rows
  * that cancel previously-appended state additively — takedown /
  * right-to-be-forgotten without touching the append-only history.
  * Retraction runs ([[BucketedState.Rt]]) live in their own sequence
  * space and their own fold lattice (folded among themselves by the
  * same oldest-`fanout` rule when they accumulate), are ALWAYS part of
  * the readable set, and [[readMerged]] drops rows whose every sum
  * column is zero — the CRDT's absorbing state — so an exactly-negated
  * key serves as if it never arrived. The negation cancels exactly at
  * every pin AT OR ABOVE the forget-time frontier — the only pins a
  * stream reads after a quiet-boundary forget (every appended batch
  * was output-committed, so no batch below the frontier replays); a
  * historical pin below it would see the full negation against a
  * partial positive history. Retraction is
  * exact for integral sum columns (long counts); float sums may leave
  * rounding residue. CAVEAT retention × retraction: a retention
  * horizon that drops a fold holding a retracted key's POSITIVE
  * history while the retraction's negative rows survive (or vice
  * versa) leaves a residue — use both together only when forgotten
  * keys do not re-arrive, the takedown contract. */
object MergeState {

  /** Append the batch's delta rows exactly once (idempotent per batch
    * id — a replay that finds the marker is a no-op, so a
    * deterministic delta can never double-count). */
  def appendDelta(df: DataFrame, path: String, batchId: Long,
      bucketCol: String, nBuckets: Int,
      prePartitioned: Boolean = false): Unit =
    BucketedState.appendOnce(df, path, batchId, bucketCol, nBuckets,
      prePartitioned)

  /** Append `df` — ALREADY NEGATED rows canceling state to forget — as
    * retraction run `forgetId`, exactly once per id (a retried forget
    * that finds the marker is a no-op). Schema must match the state's.
    * Takes the exclusive maintenance lease: run at a quiet stream
    * boundary; a live stream's appends fail fast for the duration.
    * The caller computes the negation (typically from [[readMerged]]
    * restricted to the keys to forget — see [[ChangepointGate.forget]]
    * / [[BoilerplateGate.forget]]); because unmarked partitions are
    * invisible to every reader, a crashed attempt's partial write
    * never perturbs the negation a retry recomputes. */
  def retractDelta(df: DataFrame, path: String, forgetId: Long): Unit = {
    require(forgetId >= 0, s"forgetId must be >= 0, got $forgetId")
    val spark = df.sparkSession
    BucketedState.withMaintenanceLease(spark, path) {
      val rt = Rt(0, forgetId, forgetId)
      if (!BucketedState.rtMarkers(spark, path).exists(r =>
          r.start <= rt.start && rt.hi <= r.hi)) {
        BucketedState.writeBt(df, path, rt.id)
        BucketedState.rtMarker(spark, path, rt)
      }
    }
  }

  /** Runs that no other marked run in the same lattice strictly covers
    * — the preferred run per region. (Strict containment: a fold's
    * inputs are ≥ 2 whole runs, so a covering fold's range is always
    * strictly larger; bounded count, so the quadratic scan is over
    * dozens.) */
  private def liveRanges[T](all: Seq[T])(start: T => Long,
      hi: T => Long): Seq[T] =
    all.filterNot(a => all.exists(b =>
      start(b) <= start(a) && hi(a) <= hi(b) &&
        (start(b) < start(a) || hi(a) < hi(b))))

  private def liveFolds(all: Seq[Fold]): Seq[Fold] =
    liveRanges(all)(_.start, _.hi)

  private def liveRts(all: Seq[Rt]): Seq[Rt] =
    liveRanges(all)(_.start, _.hi)

  /** The folded prefix's upper bound (−1 when nothing folded). */
  private def foldedThrough(folds: Seq[Fold]): Long =
    folds.map(_.hi).foldLeft(-1L)(math.max)

  /** Readable-run predicate at `batchId`: live folds, live retraction
    * runs (always — a committed forget is forward-visible regardless
    * of the reader's batch pin), plus unfolded level-0 deltas in
    * (foldedThrough, batchId]. */
  private def readablePred(folds: Seq[Fold], rts: Seq[Rt],
      batchId: Long): Column = {
    val h = foldedThrough(folds)
    val deltas = col("__bt") > h && col("__bt") <= batchId
    val ids = folds.map(_.id) ++ rts.map(_.id)
    if (ids.isEmpty) deltas
    else deltas || col("__bt").isin(ids: _*)
  }

  private def readable(spark: SparkSession, path: String,
      batchId: Long): Option[DataFrame] =
    BucketedState.readRaw(spark, path).map { raw =>
      val folds = liveFolds(BucketedState.foldMarkers(spark, path))
      val rts = liveRts(BucketedState.rtMarkers(spark, path))
      raw.filter(readablePred(folds, rts, batchId)).drop("__bt")
    }

  // coalesce to 0: a column added by additive SCHEMA EVOLUTION reads
  // NULL from pre-evolution runs; a group whose rows all predate the
  // evolution must serve the additive identity, not NULL
  private def sumMerge(runs: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    runs.groupBy(keyCols.map(col): _*)
      .agg(coalesce(sum(col(sumCols.head)), lit(0)).as(sumCols.head),
        sumCols.tail.map(c => coalesce(sum(col(c)), lit(0)).as(c)): _*)

  /** Keep only rows with at least one non-zero sum column — the CRDT's
    * absorbing state filter that makes retraction-by-negation serve as
    * absence. */
  private def dropAllZero(df: DataFrame, sumCols: Seq[String]): DataFrame =
    df.filter(sumCols.map(c => col(c) =!= 0).reduce(_ || _))

  /** The merged state as of batch `batchId` (the batch's own delta
    * included — merge-state gates judge post-merge): sum-merge of
    * `sumCols` grouped by `keyCols`, exchange-free over the bucketed
    * scan, with fully-retracted rows (every sum column zero) dropped.
    * None until a first delta has committed. */
  def readMerged(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String]): Option[DataFrame] =
    readable(spark, path, batchId)
      .map(r => dropAllZero(sumMerge(r, keyCols, sumCols), sumCols))

  /** Tiered compaction over the runs at or below `batchId − 1`: always
    * finishes any pending cleanup (superseded runs, unmarked debris)
    * first, applies the retention horizon if one is set, then performs
    * AT MOST ONE fold — the lowest level with ≥ `compactEvery` live
    * runs (retraction runs fold among themselves the same way and take
    * priority only when no level fold is due). Call at the top of the
    * sink, before the batch's own delta appends. Returns the folds
    * performed this invocation (≤ 1 — observability + the pin spec's
    * per-fold accounting; a retraction self-fold returns empty).
    *
    * `retainBatches`: optional retention horizon — live folds whose
    * covered batch range lies ENTIRELY below `batchId − retainBatches`
    * are dropped (marker + partition, a pure metadata-and-delete op;
    * the max-hi fold is always kept so the readable-prefix bound never
    * regresses). State size then plateaus at O(horizon) on an
    * unbounded stream instead of growing with stream age; the merged
    * readout equals the recompute over the RETAINED batches (retention
    * quantizes at fold granularity — the kept range is always a
    * superset of the horizon window). Default None = unbounded, the
    * right call when the state is already corpus-bounded (keys × days)
    * rather than stream-age-bounded. */
  def compactIfDue(spark: SparkSession, path: String, batchId: Long,
      keyCols: Seq[String], sumCols: Seq[String],
      compactEvery: Int = 8,
      retainBatches: Option[Long] = None): Seq[Fold] = {
    val fanout = math.max(2, compactEvery)
    // resolve the layout ONCE for the whole pass: every partition drop
    // below reuses it instead of re-reading sidecar + markers
    val lay = BucketedState.liveLayout(spark, path) match {
      case Some(l) => l
      case None => return Seq.empty
    }
    val marks = BucketedState.foldMarkers(spark, path)
    var live = liveFolds(marks).sortBy(_.start)
    val rtMarks = BucketedState.rtMarkers(spark, path)
    var liveRt = liveRts(rtMarks).sortBy(_.start)
    // finish a crashed cleanup: superseded folds and retraction runs
    // (marker + partition), unmarked negative partitions (a fold or
    // retraction that crashed pre-marker), and level-0 partitions the
    // fold prefix covers. Level-0 BATCH markers stay — they are append
    // idempotence, and the inventory below excludes covered ids by
    // range.
    val liveIds = live.map(_.id).toSet ++ liveRt.map(_.id).toSet
    marks.filterNot(f => liveIds(f.id)).foreach { f =>
      BucketedState.dropBt(spark, path, f.id, lay)
      BucketedState.dropFoldMarker(spark, path, f)
    }
    rtMarks.filterNot(r => liveIds(r.id)).foreach { r =>
      BucketedState.dropBt(spark, path, r.id, lay)
      BucketedState.dropRtMarker(spark, path, r)
    }
    // retention horizon: drop folds entirely older than the window,
    // keeping the max-hi fold so foldedThrough (the readable-prefix
    // bound) never regresses and covered level-0 markers stay covered
    retainBatches.foreach { retain =>
      val cutoff = batchId - retain
      val maxHi = foldedThrough(live)
      val (expired, kept) =
        live.partition(f => f.hi < cutoff && f.hi < maxHi)
      expired.foreach { f =>
        BucketedState.dropBt(spark, path, f.id, lay)
        BucketedState.dropFoldMarker(spark, path, f)
      }
      live = kept
    }
    val h0 = foldedThrough(live)
    BucketedState.btValues(spark, path, lay)
      .filter(v => (v < 0 && !liveIds(v)) || (v >= 0 && v <= h0))
      .foreach(v => BucketedState.dropBt(spark, path, v, lay))
    // level-0 inventory: committed deltas above the fold prefix,
    // strictly below the current (still-replayable) batch
    val l0 = BucketedState.committedBatches(spark, path)
      .filter(b => b > h0 && b < batchId).toSeq.sorted
      .map(b => Fold(0, b, b))
    // ONE fold this invocation: the lowest due level (level-0 backlog
    // is the one that grows every batch, so it drains first)
    val byLevel = (l0 ++ live).groupBy(_.level)
    byLevel.filter(_._2.size >= fanout).keys.toSeq.sorted.headOption match {
      case Some(level) =>
        val inputs = byLevel(level).sortBy(_.start).take(fanout)
        val out = Fold(level + 1,
          inputs.map(_.start).min, inputs.map(_.hi).max)
        require(out.level < 63,
          s"fold level ${out.level} exhausts the id encoding — raise " +
            "compactEvery (a 63-deep tier needs fanout^63 batches)")
        // debris from a crashed prior attempt at this exact output
        BucketedState.dropBt(spark, path, out.id, lay)
        val merged = dropAllZero(sumMerge(
          BucketedState.readRaw(spark, path).get
            .filter(col("__bt").isin(inputs.map(_.id): _*))
            .drop("__bt"),
          keyCols, sumCols), sumCols)
        BucketedState.writeBt(merged, path, out.id)
        BucketedState.foldMarker(spark, path, out) // the fold's commit
        inputs.foreach { f =>
          BucketedState.dropBt(spark, path, f.id, lay)
          if (f.level > 0) BucketedState.dropFoldMarker(spark, path, f)
        }
        Seq(out)
      case None if liveRt.count(_.level ==
          liveRt.map(_.level).minOption.getOrElse(0)) >= fanout =>
        // no level fold due: fold the oldest accumulated retraction
        // runs among themselves (same marker/supersession protocol;
        // all-zero rows cancel physically here)
        val lvl = liveRt.map(_.level).min
        val inputs = liveRt.filter(_.level == lvl).sortBy(_.start)
          .take(fanout)
        val out = Rt(lvl + 1,
          inputs.map(_.start).min, inputs.map(_.hi).max)
        BucketedState.dropBt(spark, path, out.id, lay)
        val merged = dropAllZero(sumMerge(
          BucketedState.readRaw(spark, path).get
            .filter(col("__bt").isin(inputs.map(_.id): _*))
            .drop("__bt"),
          keyCols, sumCols), sumCols)
        BucketedState.writeBt(merged, path, out.id)
        BucketedState.rtMarker(spark, path, out)
        inputs.foreach { r =>
          BucketedState.dropBt(spark, path, r.id, lay)
          BucketedState.dropRtMarker(spark, path, r)
        }
        Seq.empty
      case None => Seq.empty
    }
  }
}
