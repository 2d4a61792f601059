package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch window operators in
  * [[graft.operators.Events]]: `readStream` → event-time transforms with
  * watermarks → `writeStream`. Inputs carry `ts_us` (BIGINT epoch micros,
  * matching the batch path's nanos÷1000) plus `event_type` / `user_id` /
  * `value` columns.
  *
  * Scale notes: windowed aggregations shuffle by (window, key) and keep
  * only watermark-live state; session windows use the state store's
  * session merge. Late data beyond the watermark is dropped — the
  * watermark bounds state size on an unbounded stream, which is the whole
  * difference from the batch forms.
  */
object EventStreams {

  private def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ets", timestamp_micros(col("ts_us")))

  /** Tumbling 1-hour counts per event type, 1-hour watermark. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("wstart_s"),
        col("event_type"), col("n_events"))

  /** Sliding 1-hour windows every 30 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("wstart_s"),
        col("event_type"), col("n_events"))

  /** Stream-stream inner join within a time bound: pairs events from two
    * streams for the same user at most `boundSeconds` apart — in EITHER
    * direction (the one-sided BETWEEN silently dropped pairs where the
    * right event preceded the left; a symmetric bound needs the
    * two-sided range, and the watermark eviction widens accordingly).
    * Both sides carry watermarks, and the time-bound condition lets
    * Spark evict buffered rows once the other side's watermark passes —
    * without the bound (or the watermarks) state grows forever. */
  def correlate(left: DataFrame, right: DataFrame,
      boundSeconds: Long = 1800, watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val l = withEventTime(left).withWatermark("ets", watermark)
      .select(col("user_id").as("l_user"), col("ets").as("l_ets"),
        col("event_type").as("l_type"))
    val r = withEventTime(right).withWatermark("ets", watermark)
      .select(col("user_id").as("r_user"), col("ets").as("r_ets"),
        col("event_type").as("r_type"))
    l.join(r, expr(
      s"""l_user = r_user AND
          r_ets BETWEEN l_ets - INTERVAL $boundSeconds SECONDS
                    AND l_ets + INTERVAL $boundSeconds SECONDS"""))
  }

  /** Stream-static enrichment: join the stream against a batch dimension
    * table. The static side is broadcast per micro-batch (no state, no
    * watermark needed on it) — the standard pattern for attaching slowly-
    * changing reference data to an event stream at scale. Join columns
    * are DATAFRAME-QUALIFIED so a dimension key sharing the stream
    * column's name (the usual case) does not hit AMBIGUOUS_REFERENCE. */
  def enrich(stream: DataFrame, dim: DataFrame, streamKey: String,
      dimKey: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      stream(streamKey) === dim(dimKey), "left")

  /** Session windows per user with a gap timeout — the streaming
    * equivalent of the batch gaps-and-islands in Events.sessionize. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("ets", watermark)
      .groupBy(session_window(col("ets"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("long").as("session_start_s"),
        col("user_id"), col("n_events"))

  /** Streaming DSIR ingest gate: score each arriving document against a
    * BATCH-TRAINED hashed-bigram importance model
    * (`TextAnalysis.dsirModelCompiled` — train offline on the corpus,
    * serve the compiled `buckets`-bounded lookup here) and keep docs
    * whose mean fixed-point likelihood ratio clears `minW`. Entirely
    * STATELESS — tokenize → distinct bigrams → bucket → map-literal
    * lookup folded per row — so it runs in append mode with no state
    * store, no watermark, and no shuffle: the model rides the closure
    * as one `buckets`-sized literal, the streaming twin of a broadcast.
    * Unoccupied buckets fall back to the model's smoothed default.
    * Scoring a doc present in the training corpus reproduces its batch
    * [[graft.operators.TextAnalysis.dsirWeights]] value bit-for-bit
    * (same quantized integers, same fold) — spec-asserted.
    * Docs with <2 tokens have no bigrams and are dropped (no evidence
    * either way — route them to a length gate, not past it). */
  def dsirGate(stream: DataFrame, idCol: String, textCol: String,
      model: Map[Long, Long], defaultRq: Long, buckets: Int = 1024,
      minW: Double = 0.0): DataFrame = {
    val rqs = typedLit(model)
    stream
      .withColumn("bs", expr(
        s"transform(array_distinct(${graft.functions.XFormulas
          .sparkShingles(graft.functions.XFormulas.sparkTokens(textCol), 2)}), " +
          s"sg -> ${graft.functions.XFormulas.sparkStrHash("sg")} % $buckets)"))
      .withColumn("nb", size(col("bs")).cast("long"))
      .filter(col("nb") > 0)
      .withColumn("s", aggregate(col("bs"), lit(0L),
        (acc, b) => acc + coalesce(element_at(rqs, b), lit(defaultRq))))
      .withColumn("dsir_w", expr("CAST(s AS DOUBLE) / nb / 1000000"))
      .filter(col("dsir_w") >= minW)
      .select(col(idCol), col("nb"), col("dsir_w"))
  }

  /** Streaming DECONTAMINATION gate: drop arriving docs that share
    * `maxHits`-or-more distinct word n-grams with a benchmark set
    * compiled OFFLINE into a fixed-size Bloom mask
    * ([[graft.operators.Bloom.buildMask]] over the benchmark's shingle
    * hashes — same polyHash family as the batch
    * [[graft.operators.TextAnalysis.decontaminate]], so batch and
    * stream agree on what collides). Entirely STATELESS: tokenize →
    * distinct shingle hashes → count mask hits, folded per row — append
    * mode, no state store, no watermark, no shuffle; the mask rides the
    * closure as one long[] (m bits however large the benchmark grows).
    *
    * Directionality: a doc whose every shingle MISSES the mask is
    * DEFINITELY uncontaminated (Bloom has no false negatives), so
    * contamination can never slip past the gate; a clean doc is dropped
    * only if `maxHits` distinct shingles all false-positive at the
    * documented FPP — conservative in exactly the direction
    * decontamination wants. Survivors carry their `n_hits` for audit. */
  def decontamGate(stream: DataFrame, idCol: String, textCol: String,
      mask: Array[Long], k: Int, n: Int = 5, maxHits: Int = 1): DataFrame = {
    import graft.functions.GraftFunctions
    stream
      .withColumn("ghs",
        array_distinct(GraftFunctions.shingleHashes(col(textCol), n)))
      .withColumn("n_hits", aggregate(col("ghs"), lit(0L),
        (acc, g) => acc +
          when(GraftFunctions.bloomContains(g, mask, k), 1L).otherwise(0L)))
      .filter(col("n_hits") < maxHits)
      .select(col(idCol), col("n_hits"))
  }

  /** Streaming BLOCKLIST gate: arriving docs scored against a fixed
    * phrase blocklist in one Aho–Corasick pass
    * ([[graft.functions.expressions.MultiPatternCounts]] — the automaton
    * rides the plan as a reference object, the streaming twin of a
    * broadcast, however long the blocklist grows). Entirely STATELESS:
    * append mode, no state store, no shuffle. Docs with
    * `maxHits`-or-more total occurrences are dropped; survivors carry
    * their total for audit. Per-doc counts are the SAME expression the
    * batch q_blocklist_scan aggregates, so batch and stream agree
    * bit-for-bit on every document — spec-asserted. */
  def blocklistGate(stream: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String], maxHits: Long = 1L): DataFrame =
    stream
      .withColumn("cnts",
        graft.functions.GraftFunctions.multiCount(col(textCol), patterns))
      .withColumn("n_hits", aggregate(col("cnts"), lit(0L), (a, c) => a + c))
      .filter(col("n_hits") < maxHits)
      .select(col(idCol), col("n_hits"))
}
