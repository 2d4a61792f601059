package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Custom-state streaming operators via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the escape hatch for
  * semantics the built-in windowed aggregations can't express.
  *
  * State discipline at scale: state lives in the state store partitioned
  * by key; every operator here registers an EVENT-TIME timeout so
  * abandoned keys are evicted once the watermark passes — on an unbounded
  * stream an un-evicted state store IS a memory leak. (Processing-time
  * timeouts are deliberately avoided: they keep the micro-batch loop
  * spinning even with no data, burning cluster time.)
  */
object StatefulOps {

  case class Keyed(key: String, id: Long, ts_us: Long)
  // public: Catalyst's generated SafeProjection must be able to construct it
  case class KeyedE(key: String, id: Long, ts_us: Long, ets: Timestamp)
  case class SessionAgg(key: String, n: Long, firstId: Long)

  private def withWatermark(ds: Dataset[Keyed], watermark: String)
      : Dataset[KeyedE] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", watermark).as[KeyedE]
  }

  private val EvictAfterMs = 3600L * 1000

  /** Streaming exact dedup: emit only the FIRST record seen per key.
    * The batch twin is Dedup.exact (groupBy + min); here the state store
    * remembers seen keys, evicted an hour past the LATEST of the key's
    * event time and the watermark — refreshed on EVERY arrival, so an
    * actively-hot key is never evicted mid-stream and re-emitted as a
    * spurious "first" (the arm-once form evicted hot keys after one
    * horizon, and batch-1 keys at epoch+horizon while the watermark was
    * still 0). Keys silent past the horizon may re-emit — the same
    * watermark-scoped contract as dropDuplicatesWithinWatermark. */
  def firstSeen(ds: Dataset[Keyed],
      watermark: String = "1 hour"): Dataset[Keyed] = {
    val spark = ds.sparkSession
    import spark.implicits._
    withWatermark(ds, watermark)
      .groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[KeyedE], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // one pass: earliest record (deterministic by ts, then id —
            // the batch twin's min) and the latest event time for the arm
            var first: KeyedE = null
            var lastUs = 0L
            rows.foreach { r =>
              if (first == null || r.ts_us < first.ts_us ||
                (r.ts_us == first.ts_us && r.id < first.id)) first = r
              lastUs = math.max(lastUs, r.ts_us)
            }
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000, state.getCurrentWatermarkMs()) +
                EvictAfterMs)
            if (state.exists) Iterator.empty // already emitted
            else {
              state.update(true)
              Iterator.single(Keyed(first.key, first.id, first.ts_us))
            }
          }
      }
  }

  /** Running per-key count + first id, one updated row per key per batch
    * — mapGroupsWithState shape. */
  def runningCounts(ds: Dataset[Keyed],
      watermark: String = "1 hour"): Dataset[SessionAgg] = {
    val spark = ds.sparkSession
    import spark.implicits._
    withWatermark(ds, watermark)
      .groupByKey(_.key)
      .mapGroupsWithState[SessionAgg, SessionAgg](
        GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[KeyedE], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val last = state.get; state.remove(); last
          } else {
            val prev = state.getOption.getOrElse(SessionAgg(key, 0L, -1L))
            val batch = rows.toSeq
            val next = SessionAgg(key, prev.n + batch.size,
              if (prev.firstId >= 0) prev.firstId
              else batch.map(_.id).min)
            state.update(next)
            // anchor on event time too: a batch-1 watermark of 0 would
            // otherwise evict every early key at epoch + horizon
            state.setTimeoutTimestamp(
              math.max(batch.map(_.ts_us).max / 1000,
                state.getCurrentWatermarkMs()) + EvictAfterMs)
            next
          }
      }
  }

  /** Built-in streaming dedup twin: watermark-scoped exact dedup on a
    * key column (state auto-evicted past the watermark). */
  def dropDupesWithinWatermark(df: DataFrame, keyCol: String,
      tsCol: String = "ets", watermark: String = "1 hour"): DataFrame =
    df.withColumn("ets", timestamp_micros(col(tsCol)))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  case class KeyStats(key: String, n: Long, minId: Long, maxId: Long)
  case class SessIv(startUs: Long, endUs: Long, n: Long)
  case class SessState(iv: Seq[SessIv], timerMs: Long)
  case class SessionOut(key: String, start_us: Long, end_us: Long, n: Long)

  /** Session windows on the Spark 4 arbitrary-state API with EVENT-TIME
    * TIMERS: events merge into per-key session INTERVALS (two events
    * farther than `gap` apart open separate intervals — folding
    * everything into one span would glue bursts that arrive in the same
    * micro-batch, or whose timer has not fired yet, into one bogus
    * session); a session emits only when the WATERMARK passes its
    * end + gap — never eagerly on a data-witnessed gap, because a
    * still-admissible late event could yet bridge two intervals. One
    * timer per key at the earliest open interval's close point. This is
    * the full transformWithState surface — typed state, registerTimer /
    * deleteTimer, handleExpiredTimer — versus the built-in
    * `session_window` aggregation (EventStreams.sessions): use this
    * shape when the per-session output needs custom logic the built-in
    * agg can't express. */
  private class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[String, KeyedE, SessionOut] {
    @transient private var state: ValueState[SessState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[KeyedE],
        timers: TimerValues): Iterator[SessionOut] = {
      val prev = Option(state.get())
      val atoms = (prev.map(_.iv).getOrElse(Seq.empty) ++
        rows.map(r => SessIv(r.ts_us, r.ts_us, 1L)))
        .sortBy(a => (a.startUs, a.endUs))
      if (atoms.isEmpty) return Iterator.empty
      val merged = scala.collection.mutable.ArrayBuffer(atoms.head)
      atoms.tail.foreach { a =>
        val last = merged.last
        if (a.startUs <= last.endUs + gapUs)
          merged(merged.size - 1) = SessIv(last.startUs,
            math.max(last.endUs, a.endUs), last.n + a.n)
        else merged += a
      }
      prev.map(_.timerMs).filter(_ >= 0).foreach(getHandle.deleteTimer)
      val timerMs = merged.map(iv => iv.endUs / 1000 + gapUs / 1000).min
      getHandle.registerTimer(timerMs)
      state.update(SessState(merged.toSeq, timerMs))
      Iterator.empty
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionOut] = {
      val s = state.get()
      if (s == null) Iterator.empty
      else {
        val wm = timers.getCurrentWatermarkInMs()
        val (done, open) = s.iv.partition(iv =>
          iv.endUs / 1000 + gapUs / 1000 <= wm)
        if (open.isEmpty) state.clear()
        else {
          val timerMs = open.map(iv => iv.endUs / 1000 + gapUs / 1000).min
          getHandle.registerTimer(timerMs)
          state.update(SessState(open, timerMs))
        }
        done.sortBy(_.startUs).iterator
          .map(iv => SessionOut(key, iv.startUs, iv.endUs, iv.n))
      }
    }
  }

  /** Sessionize with the timer-driven transformWithState processor;
    * sessions close when the event-time watermark passes last-event +
    * gap. */
  def sessionsTws(ds: Dataset[Keyed], gapUs: Long,
      watermark: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    withWatermark(ds, watermark)
      .groupByKey(_.key)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Spark 4 `transformWithState` shape: typed ValueState, declarative
    * TTL when a ttl is given. Emits the updated running stats row for
    * each key touched in the batch. Requires the RocksDB state store
    * provider (the only provider the operator supports). */
  private class RunningStatsProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Keyed, KeyStats] {
    @transient private var state: ValueState[KeyStats] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KeyStats]("stats",
        Encoders.product[KeyStats],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[Keyed],
        timers: TimerValues): Iterator[KeyStats] = {
      var s = Option(state.get()).getOrElse(
        KeyStats(key, 0L, Long.MaxValue, Long.MinValue))
      rows.foreach { r =>
        s = KeyStats(key, s.n + 1, math.min(s.minId, r.id),
          math.max(s.maxId, r.id))
      }
      state.update(s)
      Iterator.single(s)
    }
  }

  /** Running per-key stats via the Spark 4 arbitrary-state API
    * (`transformWithState`): typed ValueState instead of hand-rolled
    * GroupState bookkeeping. Pass a ttl for declarative state eviction
    * in production (uses ProcessingTime mode — NOTE that processing-time
    * semantics keep the micro-batch loop live, so tests that drive the
    * stream with processAllAvailable must use the default no-TTL mode;
    * same class of trap as ProcessingTimeTimeout in
    * flatMapGroupsWithState). */
  def runningStatsTws(ds: Dataset[Keyed],
      ttl: Option[java.time.Duration] = None): Dataset[KeyStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new RunningStatsProcessor(ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class Valued(key: String, id: Long, value: Double)
  case class TopKState(vs: Seq[Double], ids: Seq[Long])
  case class TopKOut(key: String, id: Long, value: Double, rank: Long)

  /** Continuously-maintained per-key top-k: the streaming twin of the
    * batch `plans.TopKPerGroup` physical operator, with the same bounded
    * min-heap discipline — state per key is AT MOST k (value, id) pairs,
    * a new row displaces the heap minimum or is dropped, nothing is ever
    * sorted beyond the k survivors. Out-of-order arrival is immaterial:
    * membership in a top-k is order-independent, so a late high value
    * simply displaces the current minimum when it shows up. Emits the
    * refreshed top-k for every key touched in a batch (Update mode). */
  private class TopKProcessor(k: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Valued, TopKOut] {
    @transient private var state: ValueState[TopKState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("topk",
        Encoders.product[TopKState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[Valued],
        timers: TimerValues): Iterator[TopKOut] = {
      // min-heap over (value asc, id desc): the root is the weakest
      // member, exactly as in TopKHeaps for the batch operator
      val weakestFirst: Ordering[(Double, Long)] =
        Ordering.by[(Double, Long), (Double, Long)] {
          case (v, id) => (-v, id)
        }
      val heap =
        scala.collection.mutable.PriorityQueue.empty[(Double, Long)](weakestFirst)
      Option(state.get()).foreach(s => s.vs.zip(s.ids).foreach(heap.enqueue(_)))
      rows.foreach { r =>
        if (heap.size < k) heap.enqueue((r.value, r.id))
        else if (weakestFirst.lt(heap.head, (r.value, r.id))) ()
        else { heap.dequeue(); heap.enqueue((r.value, r.id)) }
      }
      val top = heap.dequeueAll.reverse // strongest first
      state.update(TopKState(top.map(_._1), top.map(_._2)))
      top.iterator.zipWithIndex.map { case ((v, id), i) =>
        TopKOut(key, id, v, i + 1L)
      }
    }
  }

  /** Per-key streaming top-k by value (desc, ties to the lower id) via
    * `transformWithState`. Pass a ttl for declarative state eviction in
    * production (ProcessingTime mode — see the runningStatsTws note on
    * why tests must use the no-TTL mode). */
  def topKTws(ds: Dataset[Valued], k: Int,
      ttl: Option[java.time.Duration] = None): Dataset[TopKOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new TopKProcessor(k, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class HistState(buckets: Seq[Long], counts: Seq[Long])
  case class HistOut(key: String, pct: Long, lo: Double, hi: Double, n: Long)

  /** Continuously-maintained per-key HISTOGRAM QUANTILES: the streaming
    * twin of the batch `q_hist_quantile` — state per key is the
    * fixed-width bucket-count map (a mergeable sketch, NOT the values),
    * so state size is bounded by the value range / width regardless of
    * row count. Each batch the processor folds the arrivals into the
    * histogram and re-reads the requested percentiles off the cumulative
    * counts — the same ceil(pct*n/100) rank rule as the batch query.
    * Out-of-order arrival is immaterial: a histogram is a commutative
    * monoid. Emits one row per (key, pct) touched in a batch. */
  private class HistQuantileProcessor(width: Double, pcts: Seq[Int],
      ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Valued, HistOut] {
    @transient private var state: ValueState[HistState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HistState]("hist",
        Encoders.product[HistState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[Valued],
        timers: TimerValues): Iterator[HistOut] = {
      val h = scala.collection.mutable.TreeMap.empty[Long, Long]
      Option(state.get()).foreach(s =>
        s.buckets.zip(s.counts).foreach { case (b, c) => h(b) = c })
      rows.foreach { r =>
        val b = math.floor(r.value / width).toLong
        h(b) = h.getOrElse(b, 0L) + 1L
      }
      state.update(HistState(h.keys.toSeq, h.values.toSeq))
      val total = h.values.sum
      pcts.iterator.map { pct =>
        val target = (pct * total + 99L) / 100L
        var cum = 0L
        val it = h.iterator
        var hit = h.firstKey
        while (cum < target && it.hasNext) {
          val (b, c) = it.next(); cum += c; hit = b
        }
        HistOut(key, pct.toLong, hit * width, (hit + 1) * width, total)
      }
    }
  }

  /** Per-key streaming histogram quantiles via `transformWithState`
    * (see [[HistQuantileProcessor]]). */
  def histQuantileTws(ds: Dataset[Valued], width: Double,
      pcts: Seq[Int] = Seq(50, 90),
      ttl: Option[java.time.Duration] = None): Dataset[HistOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new HistQuantileProcessor(width, pcts, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class Hashed(key: String, h: Long)
  case class KmvState(hs: Seq[Long])
  case class KmvOut(key: String, sketch_size: Long, est_distinct: Double)

  /** Continuously-maintained per-key DISTINCT-COUNT estimate: the
    * streaming twin of the batch `SigAgg.kmv` aggregator, sharing its
    * insert routine so both paths hold bit-identical sketches. State
    * per key is AT MOST k sorted longs — for streams whose keys see
    * unbounded distinct values, where exact distinct state is a memory
    * leak no watermark fixes (same motivation as the Bloom dedup gate,
    * but answering "how many" instead of "seen before?"). Out-of-order
    * arrival is immaterial: a k-min set is a commutative monoid. Emits
    * the refreshed estimate for every key touched in a batch. */
  private class KmvProcessor(k: Int, p: Long,
      ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Hashed, KmvOut] {
    @transient private var state: ValueState[KmvState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[KmvState]("kmv",
        Encoders.product[KmvState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[Hashed],
        timers: TimerValues): Iterator[KmvOut] = {
      var sk = Option(state.get()).map(_.hs.toArray)
        .getOrElse(Array.empty[Long])
      rows.foreach(r => sk = graft.functions.SigAgg.kmvInsert(sk, r.h, k))
      state.update(KmvState(sk.toSeq))
      val est =
        if (sk.length < k) sk.length.toDouble
        else (k - 1).toDouble * p.toDouble / sk(k - 1)
      Iterator.single(KmvOut(key, sk.length.toLong, est))
    }
  }

  /** Per-key streaming KMV distinct-count via `transformWithState`
    * (see [[KmvProcessor]]). `p` is the hash modulus (polyHash family's
    * P); pass a ttl for declarative state eviction in production. */
  def kmvTws(ds: Dataset[Hashed], k: Int, p: Long = 1000000007L,
      ttl: Option[java.time.Duration] = None): Dataset[KmvOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new KmvProcessor(k, p, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class HashedValue(key: String, h: Long, q: Long)
  case class QuantState(pairs: Seq[Long])
  case class QuantOut(key: String, n_sample: Long, est_p50: Double,
      est_p90: Double)

  /** Continuously-maintained per-key QUANTILE estimates from a bottom-k
    * uniform row sample: the streaming twin of the batch
    * `SigAgg.bottomKSample` aggregator, sharing its insert routine so
    * both paths hold bit-identical samples on identical input. State
    * per key is AT MOST 2k longs (interleaved hash/value pairs) however
    * many rows arrive — the percentile complement to the KMV
    * distinct-count state, for latency/size monitoring where exact
    * per-key percentiles would buffer the whole stream. Out-of-order
    * arrival is immaterial: the bottom-k pair set is a commutative
    * monoid (min-value on hash ties). Emits refreshed p50/p90 for every
    * key touched in a batch; values arrive pre-quantized (×1e4), the
    * single de-quantizing division happens at emit. */
  private class QuantileSampleProcessor(k: Int,
      ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, HashedValue, QuantOut] {
    @transient private var state: ValueState[QuantState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QuantState]("quant",
        Encoders.product[QuantState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[HashedValue],
        timers: TimerValues): Iterator[QuantOut] = {
      var b = Option(state.get()).map(_.pairs.toArray)
        .getOrElse(Array.empty[Long])
      rows.foreach(r =>
        b = graft.functions.SigAgg.bottomKInsert(b, r.h, r.q, k))
      state.update(QuantState(b.toSeq))
      val n = b.length / 2
      val vs = new Array[Long](n)
      var i = 0
      while (i < n) { vs(i) = b(2 * i + 1); i += 1 }
      java.util.Arrays.sort(vs)
      def est(p: Double): Double =
        vs(math.floor((n - 1) * p).toInt).toDouble / 10000.0
      Iterator.single(QuantOut(key, n.toLong, est(0.5), est(0.9)))
    }
  }

  /** Per-key streaming quantile estimates via `transformWithState`
    * (see [[QuantileSampleProcessor]]). */
  def quantileSampleTws(ds: Dataset[HashedValue], k: Int,
      ttl: Option[java.time.Duration] = None): Dataset[QuantOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new QuantileSampleProcessor(k, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class CmState(cnts: Seq[Long])
  case class CmOut(key: String, h: Long, est: Long)

  /** Continuously-maintained per-key COUNT-MIN sketch: the streaming
    * twin of the batch `q_cmsketch` matrix (same `SigAgg.cmCol` hash
    * family, so both paths hold bit-identical cells on identical
    * input). State per key is a FIXED depth×width long array no matter
    * how many distinct items arrive — the frequency-estimate complement
    * to the KMV distinct-count state, for "how often have I seen THIS
    * item" gates (repetition/spam thresholds) where an exact per-item
    * counter map is a memory leak. Each arrival emits the item's
    * refreshed estimate: an over-count-only bound (collisions only
    * add), exact while the key's traffic is sparse in the matrix. */
  private class CmSketchProcessor(depth: Int, width: Int, p: Long,
      ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Hashed, CmOut] {
    @transient private var state: ValueState[CmState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CmState]("cm",
        Encoders.product[CmState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[Hashed],
        timers: TimerValues): Iterator[CmOut] = {
      val cnts = Option(state.get()).map(_.cnts.toArray)
        .getOrElse(new Array[Long](depth * width))
      val out = scala.collection.mutable.ArrayBuffer.empty[CmOut]
      rows.foreach { row =>
        var r = 0
        var est = Long.MaxValue
        while (r < depth) {
          val c = r * width + graft.functions.SigAgg.cmCol(r, row.h, width, p)
          cnts(c) += 1
          if (cnts(c) < est) est = cnts(c)
          r += 1
        }
        out += CmOut(key, row.h, est)
      }
      state.update(CmState(cnts.toSeq))
      out.iterator
    }
  }

  /** Per-key streaming count-min frequency estimates via
    * `transformWithState` (see [[CmSketchProcessor]]). */
  def cmSketchTws(ds: Dataset[Hashed], depth: Int = 4, width: Int = 64,
      p: Long = 1000000007L,
      ttl: Option[java.time.Duration] = None): Dataset[CmOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new CmSketchProcessor(depth, width, p, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class KeyedItem(key: String, item: String)
  case class MgState(items: Seq[String], counts: Seq[Long])
  case class MgOut(key: String, item: String, cnt_lb: Long)

  /** Streaming MISRA-GRIES heavy hitters per key — the bounded-memory
    * "what dominates this stream" gate (top sources, hot tokens, spam
    * senders): state per key is AT MOST k (item, count) counters however
    * many distinct items arrive, and any item whose true frequency
    * exceeds n/(k+1) is GUARANTEED to be among them (counts are lower
    * bounds). Completes the streaming sketch family next to KMV ("how
    * many distinct") and count-min ("how often THIS item"). Inserts are
    * [[graft.functions.SigAgg.mgInsert]] — literally the batch
    * aggregator's reduce step — so a streamed prefix and a batch run
    * apply the identical sketch transition; spec pins the containment
    * guarantee across micro-batches. Emits the refreshed sketch for
    * every key touched in a batch (Update mode). */
  private class MisraGriesProcessor(k: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, KeyedItem, MgOut] {
    @transient private var state: ValueState[MgState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MgState]("mg",
        Encoders.product[MgState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[KeyedItem],
        timers: TimerValues): Iterator[MgOut] = {
      var m = Option(state.get())
        .map(s => s.items.zip(s.counts).toMap)
        .getOrElse(Map.empty[String, Long])
      rows.foreach(r => m = graft.functions.SigAgg.mgInsert(m, r.item, k))
      val sorted = m.toSeq.sortBy { case (it, c) => (-c, it) }
      state.update(MgState(sorted.map(_._1), sorted.map(_._2)))
      sorted.iterator.map { case (it, c) => MgOut(key, it, c) }
    }
  }

  /** Per-key streaming Misra-Gries heavy hitters via
    * `transformWithState` (see [[MisraGriesProcessor]]). */
  def misraGriesTws(ds: Dataset[KeyedItem], k: Int,
      ttl: Option[java.time.Duration] = None): Dataset[MgOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new MisraGriesProcessor(k, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
  }

  case class DocIn(doc_id: Long, mh: Seq[Long], bucketKey: String)
  case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])
  case class NearDupHit(new_id: Long, seen_id: Long, est_jaccard: Double)

  /** Streaming NEAR-dup detection: every arriving document is checked
    * against the LSH index accumulated so far. The state store IS the
    * index: keyed by (band, bucket), each key holds the (id, signature)
    * pairs that landed in that bucket — exactly the banding table the
    * batch `Dedup.minhashCandidates` self-joins, maintained
    * incrementally. A new doc compares only against its own buckets'
    * members (the LSH candidate guarantee), emits `(new_id, seen_id,
    * est_jaccard)` for estimates at or above `threshold`, then joins the
    * bucket.
    *
    * Scale/state discipline: per-bucket membership is HARD-CAPPED at
    * `maxBucket` (the streaming twin of the batch viral-bucket cap — a
    * mega-bucket would otherwise grow state AND per-arrival compare cost
    * without bound); signatures are k longs, so state per bucket is at
    * most `maxBucket × (k+1)` longs. A pair sharing several buckets may
    * be emitted once per shared band — downstream consumers dedup by
    * (new_id, seen_id) within their watermark, the same contract as the
    * batch candidate stream pre-`distinct`. */
  private class LshNearDupProcessor(k: Int, threshold: Double,
      maxBucket: Int, ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, DocIn, NearDupHit] {
    @transient private var state: ValueState[BucketState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BucketState]("lshbucket",
        Encoders.product[BucketState],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))
    override def handleInputRows(key: String, rows: Iterator[DocIn],
        timers: TimerValues): Iterator[NearDupHit] = {
      var st = Option(state.get()).getOrElse(BucketState(Nil, Nil))
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupHit]
      rows.foreach { d =>
        st.ids.zip(st.sigs).foreach { case (id, sig) =>
          if (id != d.doc_id) {
            val est = sig.zip(d.mh).count { case (x, y) => x == y }.toDouble / k
            if (est >= threshold) out += NearDupHit(d.doc_id, id, est)
          }
        }
        if (st.ids.size < maxBucket && !st.ids.contains(d.doc_id))
          st = BucketState(st.ids :+ d.doc_id, st.sigs :+ d.mh)
      }
      state.update(st)
      out.iterator
    }
  }

  /** Streaming LSH near-dup over a document stream (see
    * [[LshNearDupProcessor]]). Signature + banding are the same native
    * codegen'd expressions as the batch path, so batch and stream agree
    * on what a candidate is. */
  def lshNearDupStream(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 12, bands: Int = 4, shingle: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 64,
      ttl: Option[java.time.Duration] = None): Dataset[NearDupHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = k / bands
    docs.select(col(idCol).as("doc_id"),
        graft.functions.GraftFunctions.minhashSig(
          graft.functions.GraftFunctions.shingles(col(textCol), shingle), k)
          .as("mh"))
      .selectExpr("doc_id", "mh",
        s"explode(sequence(0L, ${bands - 1}L)) AS band")
      .select(col("doc_id"), col("mh"),
        concat_ws(":", col("band"),
          graft.functions.GraftFunctions.bandBucket(col("mh"), col("band"), r))
          .as("bucketKey"))
      .as[DocIn]
      .groupByKey(_.bucketKey)
      .transformWithState(
        new LshNearDupProcessor(k, threshold, maxBucket, ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming CONTENT dedup for a document stream: exact dedup on the
    * 64-bit polynomial fingerprint of the text (the same codegen'd
    * expression the batch corpus pipeline groups on), watermark-scoped so
    * state stays bounded. Per-row narrow fingerprint + the built-in
    * dedup operator's keyed state — at scale the only shuffle is on the
    * 8-byte fingerprint, never the payload. */
  def dedupStreamByContent(docs: DataFrame, textCol: String,
      tsCol: String = "ets", watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fp",
        graft.functions.GraftFunctions.polyHash(col(textCol)))
      .withColumn("ets", timestamp_micros(col(tsCol)))
      .withWatermark("ets", watermark)
      .dropDuplicatesWithinWatermark("fp")

  case class FpIn(shard: String, fp: Long, id: Long)
  case class BloomShard(mask: Seq[Long])

  /** Streaming dedup with a BLOOM mask as the state — the streaming twin
    * of `Bloom.noveltyFilter`, for streams whose lifetime key cardinality
    * makes exact seen-key state (dropDuplicates / [[dedupStreamByContent]])
    * a memory leak the watermark cannot fix (keys recur FOREVER, so
    * nothing ages out).
    *
    * State per shard is a FIXED mBits-bit mask — total state is
    * nshards × mBits/8 bytes no matter how many keys the stream ever
    * carries. The price is one-sided error: a true duplicate always
    * hits the mask (its bits were set when its first occurrence was
    * emitted) so the output NEVER contains a duplicate fingerprint; a
    * novel key is wrongly suppressed only on a false positive
    * (~(bits_set/m)^k at current load — size mBits for the expected
    * lifetime cardinality, or rotate shard epochs to re-arm).
    *
    * Rows are keyed by a shard of the fingerprint so mask updates
    * parallelize across the state store like any keyed aggregation. */
  private class BloomDedupProcessor(mBits: Int, k: Int)
      extends StatefulProcessor[String, FpIn, FpIn] {
    @transient private var state: ValueState[BloomShard] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[BloomShard]("bloom",
        Encoders.product[BloomShard], TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[FpIn],
        timers: TimerValues): Iterator[FpIn] = {
      val mask = Option(state.get()).map(_.mask.toArray)
        .getOrElse(new Array[Long](mBits / 64))
      val out = scala.collection.mutable.ArrayBuffer.empty[FpIn]
      rows.foreach { r =>
        if (!graft.functions.expressions.HashImpl
            .bloomContains(r.fp, mask, mBits, k)) {
          graft.functions.expressions.HashImpl.bloomSet(r.fp, mask, mBits, k)
          out += r
        }
      }
      state.update(BloomShard(mask.toSeq))
      out.iterator
    }
  }

  /** Streaming per-key QUOTA: admit at most `n` rows per key over the
    * stream's lifetime — the streaming twin of the batch
    * `Sampling.domainQuota` ("max n pages per domain" enforced at
    * ingest time, before anything lands). State per key is ONE long;
    * admission is first-come (stream order), deterministic for a given
    * arrival order. Keys keep counting after the cap so the state never
    * grows beyond one counter per key. */
  private class QuotaProcessor(n: Long)
      extends StatefulProcessor[String, FpIn, FpIn] {
    @transient private var state: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("quota",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[FpIn],
        timers: TimerValues): Iterator[FpIn] = {
      var c = if (state.exists()) state.get() else 0L
      val out = scala.collection.mutable.ArrayBuffer.empty[FpIn]
      rows.foreach { r =>
        if (c < n) out += r
        c += 1
      }
      state.update(c)
      out.iterator
    }
  }

  /** Per-source streaming quota over a document stream (see
    * [[QuotaProcessor]]): at most `n` docs per `srcCol` value admitted,
    * first-come. */
  def streamingQuota(docs: DataFrame, idCol: String, srcCol: String,
      n: Long): Dataset[FpIn] = {
    require(n >= 0, s"streamingQuota: n must be non-negative, got $n")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(srcCol).cast("string").as("shard"),
        lit(0L).as("fp"), col(idCol).as("id"))
      .as[FpIn]
      .groupByKey(_.shard)
      .transformWithState(new QuotaProcessor(n),
        TimeMode.None(), OutputMode.Append())
  }

  /** Bounded-memory streaming novelty filter over a fingerprint stream
    * (see [[BloomDedupProcessor]]). `nshards` spreads the masks across
    * state-store partitions; `mBits` is PER SHARD (must be a positive
    * multiple of 64). */
  def bloomDedupTws(docs: DataFrame, idCol: String, textCol: String,
      nshards: Int = 8, mBits: Int = 1 << 16, k: Int = 5): Dataset[FpIn] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        graft.functions.GraftFunctions.polyHash(col(textCol)).as("fp"),
        col(idCol).as("id"))
      .withColumn("shard", (col("fp") % nshards).cast("string"))
      .select(col("shard"), col("fp"), col("id"))
      .as[FpIn]
      .groupByKey(_.shard)
      .transformWithState(new BloomDedupProcessor(mBits, k),
        TimeMode.None(), OutputMode.Append())
  }

  case class TypedEv(key: String, etype: String, ts_us: Long)
  case class TypedEvE(key: String, etype: String, ts_us: Long, ets: Timestamp)
  case class FunnelState(stage: Int, firstUs: Long, lastUs: Long)
  case class FunnelOut(key: String, stage_reached: Long, completed: Boolean,
      duration_us: Long)

  /** STREAMING FUNNEL with per-stage deadlines — the streaming twin of
    * the batch `q_funnel_windowed` shape: each user's state tracks the
    * furthest stage reached and when; an event advances the funnel iff
    * it is the NEXT stage and lands within `deadlineUs` of the previous
    * advance. Emits one row per outcome: completion (all stages, with
    * end-to-end duration) or failure (deadline blown — detected either
    * by a later in-key event or by the event-time timer when the user
    * goes silent; a failed user may start a fresh funnel). Within a
    * batch, rows sort by event time; cross-batch disorder is bounded by
    * the watermark, the same contract as every windowed aggregation.
    * State per key is three longs — eviction by event-time timer keeps
    * the store bounded on an unbounded stream. */
  def streamingFunnel(ds: Dataset[TypedEv], stages: Seq[String],
      deadlineUs: Long, watermark: String = "10 minutes")
      : Dataset[FunnelOut] = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val spark = ds.sparkSession
    import spark.implicits._
    val n = stages.size
    ds.withColumn("ets", timestamp_micros(col("ts_us")))
      .withWatermark("ets", watermark).as[TypedEvE]
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[TypedEvE], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(FunnelOut(key, st.stage.toLong, completed = false,
              st.lastUs - st.firstUs))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[FunnelOut]
            var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
            rows.toSeq.sortBy(e => (e.ts_us, e.etype)).foreach { e =>
              // blown deadline observed via a later event: fail + reset
              if (st.stage > 0 && st.stage < n &&
                e.ts_us - st.lastUs > deadlineUs) {
                out += FunnelOut(key, st.stage.toLong, completed = false,
                  st.lastUs - st.firstUs)
                st = FunnelState(0, 0L, 0L)
              }
              if (st.stage == 0) {
                if (e.etype == stages.head) st = FunnelState(1, e.ts_us, e.ts_us)
              } else if (st.stage < n && e.etype == stages(st.stage)) {
                st = FunnelState(st.stage + 1, st.firstUs, e.ts_us)
                if (st.stage == n) {
                  out += FunnelOut(key, n.toLong, completed = true,
                    e.ts_us - st.firstUs)
                  st = FunnelState(0, 0L, 0L)
                }
              }
            }
            if (st.stage > 0) {
              state.update(st)
              // silent-user eviction, anchored on EVENT time: the timer
              // must not fire while an on-time next-stage event is still
              // admissible, so it sits at last-advance + deadline — once
              // the watermark passes that, any qualifying event would be
              // late-dropped anyway. (Arming at watermark + deadline
              // failed funnels early whenever other keys' traffic pushed
              // the watermark, and turned every batch-1 funnel into an
              // epoch+deadline timeout.) The max() keeps the timestamp
              // ahead of the watermark, which the API requires.
              state.setTimeoutTimestamp(
                math.max(st.lastUs / 1000 + deadlineUs / 1000,
                  state.getCurrentWatermarkMs()) + 1)
            } else state.remove()
            out.iterator
          }
      }
  }
}
