package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XFormulas._

/** Text-analysis operators for a training-data pipeline: token stats,
  * language-ID heuristic, quality scoring, document fingerprinting.
  * All pure `org.apache.spark.sql.functions` / SQL higher-order-function
  * compositions — no UDFs — so they stay in Tungsten and scale linearly
  * with a narrow (per-row) dependency: no shuffle at all.
  */
object TextAnalysis {

  /** Adds a `toks` column: lowercased whitespace tokens. */
  def withTokens(df: DataFrame, textCol: String): DataFrame =
    // native tokenizer — identical element set/order to the
    // XFormulas.sparkTokens HOF (the oracle's string_split form); this
    // is the entry expression of every text query, so the smaller
    // generated body shrinks the whole suite's cold JIT cost
    df.withColumn("toks",
      graft.functions.GraftFunctions.tokens(col(textCol)))

  /** Per-document token statistics. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(
      idCol,
      "CAST(size(toks) AS BIGINT) AS n_tokens",
      s"CAST(length($textCol) AS BIGINT) AS text_len",
      // exact: int sum cast to double, then one division
      "CAST(aggregate(toks, 0L, (acc, w) -> acc + length(w)) AS DOUBLE) / nullif(size(toks), 0) AS avg_token_len",
      s"CAST(${sparkStopHits("toks")} AS BIGINT) AS stop_hits")

  /** n-gram-free language-ID heuristic: stopword hits over the token set.
    * (A real pipeline would use char-n-gram profiles; the *shape* — a
    * per-row codegen'd expression, no shuffle — is the point.) */
  def langGuess(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(
      idCol,
      s"CASE WHEN ${sparkStopHits("toks")} >= 2 THEN 'en' " +
        s"WHEN ${sparkStopHits("toks")} >= 1 THEN 'maybe_en' " +
        "ELSE 'other' END AS lang_guess")

  /** Quality score in [0,1]: length saturation + stopword ratio + short-
    * token ratio, equally deterministic in Spark and DuckDB (identical
    * IEEE expression trees). */
  /** SQL text of the per-row quality score over a `toks` column —
    * exposed so one-pass report queries can fuse it with other per-doc
    * columns instead of re-tokenizing through [[quality]]. */
  def qualityExpr: String =
    "0.4 * least(CAST(size(toks) AS DOUBLE) / 50.0, 1.0) + " +
      s"0.3 * (CAST(${sparkStopHits("toks")} AS DOUBLE) / nullif(size(toks), 0)) + " +
      "0.3 * (CAST(size(filter(toks, w -> length(w) <= 5)) AS DOUBLE) / nullif(size(toks), 0))"

  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol).selectExpr(idCol, s"$qualityExpr AS quality")

  /** Char-n-gram language-ID: per-occurrence density of high-frequency
    * English trigrams over the document's char trigrams. Still a pure
    * per-row codegen'd expression — no shuffle, no UDF — but a real
    * n-gram profile rather than the stopword shortcut in [[langGuess]].
    * Density thresholds calibrated on the synthetic corpus (median 0.039,
    * max 0.092). */
  def langCharNgram(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("tris", expr(sparkCharTrigrams(s"lower($textCol)")))
      .selectExpr(
        idCol,
        s"CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) AS tri_score",
        s"CASE WHEN CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) >= 0.05 THEN 'en' " +
          s"WHEN CAST(${sparkTrigramHits("tris")} AS DOUBLE) / nullif(size(tris), 0) >= 0.02 THEN 'maybe_en' " +
          "ELSE 'other' END AS lang3")

  /** Polynomial rolling-hash fingerprint of the raw text (native
    * codegen'd expression; bit-identical to the XFormulas HOF form). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.GraftFunctions.polyHash(col(textCol)).as("fp"))

  /** Per-document REPETITION metrics (the Gopher/RefinedWeb-style
    * signals for detecting boilerplate and degenerate generations):
    * distinct-token ratio, most-frequent-token share, and distinct
    * word-trigram ratio. Pure per-row HOFs — the top-share scan is
    * O(distinct × tokens) per document, still narrow (no explode, no
    * shuffle), which beats a corpus-wide explode+groupBy for a per-doc
    * statistic at any scale. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withTokens(df, textCol)
      .withColumn("tri", expr(sparkShingles("toks", 3)))
      .select(
        col(idCol),
        expr("CAST(size(toks) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(array_distinct(toks)) AS DOUBLE) / nullif(size(toks), 0)")
          .as("distinct_ratio"),
        // native O(n) hash-count max — exact HOF/oracle value, see
        // TopTokenCount's scaladoc for the empty-array NULL argument
        (graft.functions.GraftFunctions.topTokenCount(col("toks"))
          .cast("double") / expr("nullif(size(toks), 0)")).as("top_share"),
        expr("CAST(size(array_distinct(tri)) AS DOUBLE) / nullif(size(tri), 0)")
          .as("tri_ratio"))

  /** Composite QUALITY GATE: per-rule boolean flags plus the combined
    * verdict, thresholds calibrated so the synthetic corpus actually
    * splits (token stats: 10-99 tokens, top-share 0.05-0.30). Emitting
    * the per-rule flags (not just the verdict) is the production shape —
    * pipeline dashboards need rejection-reason breakdowns. */
  def qualityGate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    repetition(df, idCol, textCol)
      .withColumn("flag_len",
        col("n_tokens").geq(20) && col("n_tokens").leq(90))
      .withColumn("flag_diverse", col("distinct_ratio") >= 0.45)
      .withColumn("flag_rep", col("top_share") <= 0.12)
      .withColumn("pass",
        col("flag_len") && col("flag_diverse") && col("flag_rep"))
      .select(col(idCol), col("flag_len"), col("flag_diverse"),
        col("flag_rep"), col("pass"))

  /** PII REDACTION: mask email / phone / IPv4 shapes with typed
    * placeholders and report per-category hit counts — the standard
    * pre-training scrub pass. Pure regexp built-ins (codegen'd, narrow,
    * no shuffle): the pass streams through the corpus at scan speed, and
    * the per-category counts come from `regexp_extract_all` on the
    * ORIGINAL text so the audit trail is independent of replacement
    * order. Patterns use portable character-class syntax (no perl
    * shorthands) so Java regex and RE2-family engines agree. */
  val piiEmail = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  val piiPhone = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val piiIp = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.selectExpr(idCol,
      s"regexp_replace(regexp_replace(regexp_replace($textCol, " +
        s"'$piiEmail', '[EMAIL]'), '$piiIp', '[IP]'), " +
        s"'$piiPhone', '[PHONE]') AS redacted",
      s"CAST(size(regexp_extract_all($textCol, '$piiEmail', 0)) AS BIGINT) AS n_emails",
      s"CAST(size(regexp_extract_all($textCol, '$piiPhone', 0)) AS BIGINT) AS n_phones",
      s"CAST(size(regexp_extract_all($textCol, '$piiIp', 0)) AS BIGINT) AS n_ips")

  /** Benchmark DECONTAMINATION: for every corpus document, count the
    * distinct word-`n`-gram collisions with a benchmark document set —
    * the standard n-gram-overlap test for train/test leakage. Shingles
    * are reduced to 64-bit polynomial hashes BEFORE the join, so the
    * shuffle moves 8-byte keys, never text; the benchmark side of the
    * join is tiny by construction (broadcast at scale). Only documents
    * with at least one collision are returned. */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    def grams(df: DataFrame, outId: String) =
      df.withColumn("sh",
          graft.functions.GraftFunctions.shingles(col(textCol), n))
        .select(col(idCol).as(outId),
          // native codegen'd PolyHash per shingle (bit-identical to the
          // HOF/duck string-hash form) — the HOF version splits every
          // shingle into per-char strings and was ~4x slower
          explode(array_distinct(transform(col("sh"),
            s => graft.functions.GraftFunctions.polyHash(s)))).as("gh"))
    grams(docs, "doc_id_c")
      .join(broadcast(grams(bench, "bench_id")), "gh")
      .groupBy(col("doc_id_c").as(idCol))
      .agg(countDistinct(col("gh")).as("n_shared_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Positional variant of [[decontaminate]]: WHERE the collisions are.
    * Returns (id, positions, n_hits) — the 1-based token index of every
    * n-gram in the doc that also occurs in the benchmark set, sorted —
    * the span list a masking/excision pass consumes (count-only
    * decontamination can only drop whole docs; spans let the pipeline
    * surgically cut the leaked window and keep the rest). Same
    * hash-before-join discipline: the exchange carries (id, pos, hash),
    * never text, and the benchmark side broadcasts. */
  def contaminatedSpans(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    // POSITIONAL shingle-hash stream, NOT the native Shingles
    // expression: that one dedupes by design, so its posexplode indexes
    // the deduped array — a doc whose repeated n-gram matches the
    // benchmark would report one position instead of all of them
    val docGrams = docs
      .select(col(idCol),
        posexplode(graft.functions.GraftFunctions
          .shingleHashes(col(textCol), n)).as(Seq("pos0", "gh")))
    val benchGrams = bench
      .withColumn("sh",
        graft.functions.GraftFunctions.shingles(col(textCol), n))
      .select(explode(array_distinct(transform(col("sh"),
        s => graft.functions.GraftFunctions.polyHash(s)))).as("gh"))
      .distinct()
    docGrams.join(broadcast(benchGrams), "gh")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list((col("pos0") + 1).cast("long")))
        .as("positions"),
        count(lit(1)).as("n_hits"))
  }

  /** EXCISION pass over [[contaminatedSpans]]: emit the corpus with the
    * contaminated windows CUT OUT — token i is dropped iff some flagged
    * n-gram starting at position p covers it (p <= i <= p+n-1), the
    * surgical alternative to dropping whole documents (count-only
    * decontamination throws away everything around a one-line leak).
    * Docs with no flagged spans pass through verbatim; the rebuild is a
    * narrow HOF chain (index-filter + concat), so the only exchanges
    * are the span detection's own. Returns (id, clean_text,
    * n_tokens_removed). */
  def exciseContaminated(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    // persist: the corpus projection feeds BOTH the span detection and
    // the rebuild join — one corpus scan, not two
    val slim = graft.operators.Dedup.persistTracked(
      docs.select(col(idCol), col(textCol)))
    val spans = contaminatedSpans(slim, bench, idCol, textCol, n)
      .select(col(idCol), col("positions"))
    slim
      .join(spans, Seq(idCol), "left")
      .withColumn("ps", coalesce(col("positions"), expr("array()")))
      .withColumn("toks",
        graft.functions.GraftFunctions.tokens(col(textCol)))
      .withColumn("kept", expr(
        s"filter(transform(toks, (t, i) -> struct(t AS t, i + 1 AS ix)), " +
          s"x -> NOT exists(ps, p -> p <= x.ix AND x.ix <= p + ${n - 1}))"))
      .select(col(idCol),
        expr("concat_ws(' ', transform(kept, x -> x.t))").as("clean_text"),
        expr("CAST(size(toks) - size(kept) AS BIGINT)")
          .as("n_tokens_removed"))
  }

  /** Corpus BIGRAM LANGUAGE-MODEL table: conditional probability of each
    * bigram given its first word, `p = cnt(w1 w2) / cnt(w1 *)`. Counts
    * are DOCUMENT frequencies — the shingle generator emits each
    * document's distinct bigrams once — which is the dedup-robust choice
    * for corpus statistics (a single degenerate repeated-text document
    * can't dominate the table). ONE aggregation over the bigram stream
    * (generator expression, no intermediate arrays); the prefix total
    * `n1` is a window sum over the tiny aggregated output — the
    * generator/scan subtree runs exactly once. */
  def bigramLm(df: DataFrame, textCol: String): DataFrame = {
    val bigrams = df.select(graft.functions.GraftFunctions
      .shingleRows(col(textCol), 2).as("bigram"))
      .withColumn("w1", expr("split(bigram, ' ')[0]"))
    bigrams.groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n1", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .withColumn("p", expr("CAST(n AS DOUBLE) / n1"))
      .select(col("bigram"), col("n"), col("p"))
  }

  /** Per-document LANGUAGE-MODEL SCORE from the corpus bigram LM — the
    * CCNet/Wikipedia-LM quality signal: documents whose bigrams are
    * improbable under the corpus's own statistics are gibberish, boiler-
    * plate, or wrong-language; rank ascending and the worst float to the
    * top for filtering.
    *
    * score(d) = mean over d's distinct bigrams of p(w2|w1), with each
    * conditional probability fixed-pointed to an integer
    * `q = round(1e9·n/n1)` BEFORE summing — BIGINT sums are associative,
    * so the mean is bit-identical across engines and partitionings
    * (double sums are not; this is the repo-wide decimal-sum trick
    * applied to probabilities). Perplexity proper needs log(), whose last
    * ulp is engine-specific — the mean-probability score ranks documents
    * for the same purpose with exact cross-engine semantics.
    *
    * Scale: the LM table and the per-doc bigram stream both derive from
    * ONE persisted generator pass (multi-consumer barrier — the
    * q_basket_lift lesson). The join key is the bigram string; at 100 TB
    * swap it for a 128-bit fingerprint so the exchange ships 16 bytes a
    * row (collisions under mod-P single hashes are real at billions of
    * bigrams; the string key is exact and the corpus-vocabulary table it
    * joins is Zipf-bounded). Docs with <2 tokens have no bigrams and are
    * absent from the output. */
  def bigramDocScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bw = Dedup.persistTracked(
      df.select(col(idCol), graft.functions.GraftFunctions
        .shingleRows(col(textCol), 2).as("bigram"))
        .withColumn("w1", expr("split(bigram, ' ')[0]")))
    val lm = bw.groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n1", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
    bw.join(lm, Seq("w1", "bigram"))
      .withColumn("q",
        expr("CAST(ROUND(CAST(n AS DOUBLE) * 1000000000 / n1) AS BIGINT)"))
      .groupBy(col(idCol))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("nb"))
      .withColumn("avg_p", expr("CAST(s AS DOUBLE) / nb / 1000000000"))
      .select(col(idCol), col("nb"), col("avg_p"))
  }

  /** Distributed BPE-merge TRAINING (Sennrich et al. 2016) over the
    * corpus word-frequency dictionary — the tokenizer-training loop run
    * where tokenizers are actually trained at scale: on the cluster,
    * against the full corpus. Each round is (1) count adjacent symbol
    * pairs weighted by word frequency — one explode + partial/final
    * aggregation over the DISTINCT-WORD dictionary, never the corpus
    * text; (2) pick the most frequent pair (ties: lexicographic — fully
    * deterministic); (3) greedily merge that pair left-to-right in every
    * word via one narrow fold. Returns one row per round:
    * (merge_round, lsym, rsym, freq).
    *
    * Scale: corpus text is touched ONCE (the word-count aggregation
    * shuffles words, Zipf-bounded); every training round then works on
    * the dictionary, whose size is vocabulary- not corpus-bound — the
    * standard word-dict BPE optimization. Each dictionary generation is
    * persisted (multi-consumer: pair counts + the next rewrite).
    * Within-word merges only (no end-of-word marker) — documented
    * simplification; the loop structure is identical with one.
    *
    * Determinism: pure integer counts and string ops; the greedy
    * left-to-right rewrite is the reference BPE application order. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 3): DataFrame =
    bpeTrain(docs, textCol, rounds)._3.reduce(_.unionAll(_))

  /** The shared BPE training loop: returns (initial dictionary, final
    * dictionary, per-round merge rows). Dictionaries are (cnt, syms)
    * frames; every generation is persisted (each feeds pair counting
    * AND the next rewrite). */
  private def bpeTrain(docs: DataFrame, textCol: String, rounds: Int)
      : (DataFrame, DataFrame, Seq[DataFrame]) = {
    val w0 = Dedup.persistTracked(withTokens(docs, textCol)
      .select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .selectExpr("cnt",
        "transform(sequence(1, length(word)), " +
          "i -> substring(word, CAST(i AS INT), 1)) AS syms"))
    var w = w0
    val perRound = (1 to rounds).map { rnd =>
      val pairs = w
        .select(col("cnt"), explode(expr(
          "transform(slice(sequence(1, size(syms)), 1, size(syms) - 1), " +
            "i -> struct(element_at(syms, CAST(i AS INT)) AS l, " +
            "element_at(syms, CAST(i + 1 AS INT)) AS r))")).as("pr"))
        .groupBy(col("pr.l").as("lsym"), col("pr.r").as("rsym"))
        .agg(sum(col("cnt")).as("freq"))
      val top = Dedup.persistTracked(pairs
        .orderBy(col("freq").desc, col("lsym"), col("rsym")).limit(1))
      w = Dedup.persistTracked(w.crossJoin(broadcast(top))
        .selectExpr("cnt",
          "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> " +
            "CASE WHEN size(acc) > 0 AND element_at(acc, -1) = lsym " +
            "AND s = rsym " +
            "THEN concat(slice(acc, 1, size(acc) - 1), " +
            "array(concat(lsym, rsym))) " +
            "ELSE concat(acc, array(s)) END) AS syms"))
      top.select(lit(rnd).cast("long").as("merge_round"),
        col("lsym"), col("rsym"), col("freq"))
    }
    (w0, w, perRound)
  }

  /** BPE compression readout: corpus symbol counts before vs after
    * applying the `rounds` learned merges — the "what did training buy"
    * number a tokenizer team tracks (symbols/word → sequence length →
    * training FLOPs). Exact BIGINT sums over the dictionary. */
  def bpeCompression(docs: DataFrame, textCol: String,
      rounds: Int = 3): DataFrame = {
    val (w0, wN, _) = bpeTrain(docs, textCol, rounds)
    val before = w0.agg(
      sum(col("cnt")).as("total_words"),
      sum(expr("cnt * size(syms)")).as("syms_before"))
    val after = wN.agg(sum(expr("cnt * size(syms)")).as("syms_after"))
    before.crossJoin(after)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much its HASHED-BIGRAM profile resembles a target
    * slice (`targetPred`, e.g. a trusted domain) relative to the raw
    * corpus. Per bucket `b`, both n-gram models are Laplace-smoothed
    * document frequencies; the per-bucket importance factor is the
    * likelihood ratio
    * `p_t(b)/p_r(b) = (n_t+1)(N_r+B) / ((n_r+1)(N_t+B))`, fixed-pointed
    * to `round(1e6·ratio)` BIGINT, and a document's weight is the MEAN
    * factor over its bigram occurrences. DSIR proper sums LOG ratios;
    * log()'s last ulp is engine-specific (the [[bigramDocScores]]
    * perplexity note), so this takes the arithmetic- instead of
    * geometric-mean ratio — same signal, exact cross-engine semantics:
    * integer products stay under 2^53 (exact as DOUBLE), and the single
    * IEEE division + round is bit-identical by definition.
    *
    * Scale: text reduces to (doc, bucket) ints in-scope — one persisted
    * generator pass feeds both the model aggregation and the scoring
    * join (multi-consumer barrier); the model is `buckets` rows, a
    * broadcast; the only corpus-sized shuffle is the per-doc partial/
    * final aggregation. This is the whole point of DSIR's hashing: the
    * model never grows with the corpus. At quadrillions of n-grams swap
    * the BIGINT products for DECIMAL. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column,
      buckets: Int = 1024): DataFrame = {
    val g = dsirGrams(df, idCol, textCol, targetPred, buckets)
    g.join(broadcast(dsirModel(g, buckets)), "b")
      .groupBy(col(idCol))
      .agg(sum(col("rq")).as("s"), count(lit(1)).as("nb"))
      .withColumn("dsir_w", expr("CAST(s AS DOUBLE) / nb / 1000000"))
      .select(col(idCol), col("nb"), col("dsir_w"))
  }

  /** The persisted (doc, is_target, bucket) gram stream [[dsirWeights]]
    * trains and scores on. polyHash is non-negative (mod-P arithmetic),
    * so plain % == pmod. */
  private def dsirGrams(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, buckets: Int): DataFrame =
    Dedup.persistTracked(
      df.select(col(idCol), targetPred.as("is_target"),
        graft.functions.GraftFunctions
          .shingleRows(col(textCol), 2).as("bigram"))
        .withColumn("b", graft.functions.GraftFunctions
          .polyHash(col("bigram")) % buckets)
        .select(col(idCol), col("is_target"), col("b")))

  /** The trained DSIR model: one (bucket, fixed-point likelihood-ratio)
    * row per occupied bucket — at most `buckets` rows regardless of
    * corpus size. */
  private def dsirModel(g: DataFrame, buckets: Int): DataFrame = {
    // corpus-wide totals as a broadcast 1-row scalar, not a
    // constant-key window (a constant partition key still moves the
    // whole frame to one task)
    val counts = Dedup.persistTracked(g.groupBy(col("b"))
      .agg(count(lit(1)).as("n_r"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("n_t")))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n_r")).as("nr_tot"),
        sum(col("n_t")).as("nt_tot"))))
      .withColumn("rq", expr(
        s"CAST(ROUND(1000000 * (CAST((n_t + 1) * (nr_tot + $buckets) AS DOUBLE) " +
          s"/ CAST((n_r + 1) * (nt_tot + $buckets) AS DOUBLE))) AS BIGINT)"))
      .select(col("b"), col("rq"))
  }

  /** Train the DSIR model and COMPILE it to a driver-held lookup —
    * (bucket → fixed-point ratio, plus the smoothed default for buckets
    * the training corpus never occupied). The map is bounded by
    * `buckets` (the legitimate codebook-sized collect, like the k-means
    * centroids): this is the serving form a streaming ingest gate
    * broadcasts to score documents statelessly — see
    * `EventStreams.dsirGate`. */
  def dsirModelCompiled(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, buckets: Int = 1024)
      : (Map[Long, Long], Long) = {
    val g = dsirGrams(df, idCol, textCol, targetPred, buckets)
    val m = dsirModel(g, buckets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val Array(nrTot, ntTot) = g
      .agg(count(lit(1)).as("nr"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val default = math.round(1e6 * ((nrTot + buckets).toDouble /
      (ntTot + buckets).toDouble))
    (m, default)
  }

  /** Per-document N-GRAM NOVELTY: the fraction of a document's distinct
    * bigrams whose FIRST corpus occurrence (by ascending doc id — the
    * ingest order) is this document. The deterministic proxy for greedy
    * coverage selection: high-novelty documents contribute n-grams the
    * already-kept prefix lacks, boilerplate and near-dups score ~0 —
    * the ordering-based complement to MinHash dedup (which needs a
    * pairwise match; novelty catches diffuse, corpus-wide redundancy).
    *
    * Scale: one persisted (doc, bigram) generator pass feeds the
    * first-occurrence aggregation AND the scoring join; the join key is
    * the bigram string against the Zipf-bounded vocabulary table (same
    * 128-bit-fingerprint-at-100 TB note as [[bigramDocScores]]). Pure
    * integer counts + one final division — engine- and partition-exact. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = Dedup.persistTracked(
      df.select(col(idCol), graft.functions.GraftFunctions
        .shingleRows(col(textCol), 2).as("bigram")))
    val first = g.groupBy(col("bigram"))
      .agg(min(col(idCol)).as("first_doc"))
    g.join(first, "bigram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("novel"))
      .withColumn("novelty", expr("CAST(novel AS DOUBLE) / nb"))
      .select(col(idCol), col("nb"), col("novel"), col("novelty"))
  }

  /** HEAPS'-LAW vocabulary growth readout: cumulative distinct word
    * types vs cumulative token count as the corpus is scanned in doc-id
    * order — the sublinear type-growth curve (V ≈ K·nᵝ) a corpus team
    * plots to spot saturation (flattening = mostly-duplicate tail) or
    * contamination (a jump = injected foreign vocabulary). Each word's
    * type contribution is attributed to its first-occurrence document;
    * both curves are exact BIGINT prefix sums over the per-doc
    * aggregates, computed with the two-phase range-partitioned shape
    * (plans.ParallelRank) — the per-doc frame is itself data-sized, so
    * even this "readout" stage never single-tasks. */
  def heapsLaw(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.persistTracked(withTokens(df, textCol)
      .select(col(idCol), explode(col("toks")).as("word")))
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"))
    val newTypes = toks.groupBy(col("word"))
      .agg(min(col(idCol)).as("first_doc"))
      .groupBy(col("first_doc")).agg(count(lit(1)).as("new_types"))
    // the per-doc frame is data-sized, so both prefix sums ride the
    // two-phase range-partitioned shape, never a global window
    val joined = perDoc
      .join(newTypes, perDoc(idCol) === newTypes("first_doc"), "left")
      .select(perDoc(idCol), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    graft.plans.ParallelRank.withRunningAggs(joined, 32,
        Seq(graft.plans.ParallelRank.RunCol("cum_tokens", col("n_tokens"),
            "sum", inclusive = true),
          graft.plans.ParallelRank.RunCol("cum_types", col("new_types"),
            "sum", inclusive = true)),
        col(idCol))
      .select(col(idCol), col("cum_tokens"), col("cum_types"))
  }

  /** Positional postings — (id, word, pos), pos 1-based — the index
    * side of phrase retrieval. One tokenize+posexplode pass; written
    * sorted by word so parquet row-group min/max stats turn a term
    * lookup into a data-skipping read (the same zone-map mechanics as
    * `VersionedTable.readWhere`, here for free from the format). */
  def positionalIndex(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    withTokens(df, textCol)
      .select(col(idCol), posexplode(col("toks")).as(Seq("p0", "word")))
      .select(col(idCol), col("word"), (col("p0") + 1L).as("pos"))

  /** Exact phrase match over a positional index: per document, the
    * number of occurrences of `phrase` as CONSECUTIVE tokens and the
    * first match position. Returns (id, n_hits, first_pos).
    *
    * The scale shape is the classic positional-index phrase plan: each
    * term's postings are filtered FIRST (an `In` predicate that reaches
    * the index scan — on a stored, word-sorted index that is a
    * row-group skip, not a corpus pass), then n-1 equi-joins on
    * (id, phrase-start position) stitch the terms. Cost follows the
    * RAREST term's postings: the stitch is ANCHORED on the term with
    * the smallest postings count (one cheap count over the persisted
    * slim frame), so every intermediate join is bounded by the rarest
    * term's frequency — a stopword-leading phrase no longer pays a
    * stopword-frequency-sized first join. */
  def phraseQuery(index: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    // ONE pushdown In scan over the union of the terms' postings,
    // persisted so the per-term slices below are in-memory cuts of it
    // rather than n separate index scans (the multi-scan guard's
    // point: the scan count must not grow with phrase length)
    val slim = Dedup.persistTracked(
      index.filter(col("word").isin(phrase: _*))
        .select(col(idCol), col("word"), col("pos")))
    // |phrase|-row aggregate over the in-memory slim frame; a term with
    // zero postings counts 0 and wins the anchor — the stitch is then
    // provably empty after zero join work
    val freq = slim.groupBy(col("word")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val anchorIdx = phrase.indices
      .minBy(i => (freq.getOrElse(phrase(i), 0L), i))
    // p = phrase-start position, so every term at phrase offset i joins
    // on (id, pos - i) regardless of which term anchors
    val anchor = slim.filter(col("word") === phrase(anchorIdx))
      .select(col(idCol), (col("pos") - anchorIdx.toLong).as("p"))
    val rest = phrase.zipWithIndex
      .filter(_._2 != anchorIdx)
      .sortBy { case (w, i) => (freq.getOrElse(w, 0L), i) }
    val stitched = rest.foldLeft(anchor) {
      case (acc, (w, i)) =>
        acc.join(
          slim.filter(col("word") === w)
            .select(col(idCol), (col("pos") - i.toLong).as("p")),
          Seq(idCol, "p"))
    }
    stitched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), min(col("p")).as("first_pos"))
  }

  /** PROXIMITY-SCORED multi-term retrieval over a positional index:
    * documents containing ALL `terms` (AND semantics), scored by the
    * SUM of per-term BM25 weights (the q_bm25 rational form — log-idf
    * replaced by the odds ratio, e0 literals, fixed fold order so both
    * engines build the identical IEEE expression tree) times a MIN-SPAN
    * proximity bonus: 1 + 1/(1 + span - |terms|), where span is the
    * smallest token window containing every term at least once.
    * Returns the top-`k` as (id, span, score, rnk).
    *
    * Min-span is the classic doc-at-a-time sliding window, expressed
    * relationally so the oracle can replicate it exactly: the optimal
    * window starts at some term occurrence, so for every anchor
    * position take each term's NEXT occurrence at/after it (a
    * postings-vs-postings join bounded by per-doc term frequency,
    * never doc length) and minimize max(next) − anchor + 1 over
    * anchors that see all terms.
    *
    * Scale shape: the term postings arrive from ONE pushdown In scan
    * of the stored word-sorted index (a row-group skip, not a corpus
    * pass) and are persisted — tf, document frequency, and the span
    * join are in-memory cuts of that slim frame. Corpus length stats
    * are one column-pruned aggregate of the index. The global ranking
    * rides plans.ParallelRank — never an unpartitioned window.
    *
    * Corpus-denominator contract: nd and sum_dl count documents WITH
    * AT LEAST ONE TOKEN — the documents a positional index can see.
    * A zero-token document contributes no postings, so an index-only
    * operator cannot (and deliberately does not) count it; a reference
    * computing BM25 stats from the raw corpus must apply the same
    * >= 1-token filter or every score diverges. */
  def proximityRank(index: DataFrame, idCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms,
      s"terms must be non-empty and distinct, got $terms")
    require(k > 0, s"k must be positive, got $k")
    val n = terms.size
    // corpus stats from the index itself: dl = tokens per doc
    val dls = Dedup.persistTracked(
      index.groupBy(col(idCol)).agg(count(lit(1)).as("dl")))
    val corpus = dls.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sum_dl"))
    val p = Dedup.persistTracked(
      index.filter(col("word").isin(terms: _*))
        .select(col(idCol), col("word"), col("pos")))
    // per-doc tf pivoted to fixed columns (terms are a fixed list, so
    // the float fold below can sum them in one deterministic order)
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("word") === t, 1L).otherwise(0L)).as(s"tf_$i") }
    val tf = p.groupBy(col(idCol)).agg(tfAggs.head, tfAggs.tail: _*)
      .filter(terms.indices.map(i => col(s"tf_$i") > 0L).reduce(_ && _))
    // per-term document frequency as a 1-row broadcast
    val dfAggs = terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("word") === t, 1L).otherwise(0L)).as(s"dfq_$i") }
    val dfreq = p.select(col("word"), col(idCol)).distinct()
      .agg(dfAggs.head, dfAggs.tail: _*)
    // min-span: anchors × next-occurrence-per-term, all integer
    val nxt = p.select(col(idCol), col("pos").as("apos"))
      .join(p.select(col(idCol), col("word"), col("pos").as("bpos")),
        Seq(idCol))
      .filter(col("bpos") >= col("apos"))
      .groupBy(col(idCol), col("apos"), col("word"))
      .agg(min(col("bpos")).as("npos"))
    val spans = nxt.groupBy(col(idCol), col("apos"))
      .agg(count(lit(1)).as("nw"), max(col("npos")).as("mx"))
      .filter(col("nw") === n.toLong)
      .groupBy(col(idCol))
      .agg(min(col("mx") - col("apos") + 1L).as("span"))
    val bm25 = terms.indices.map(i =>
      s"((tf_$i * 2.2e0) / (tf_$i + 1.2e0 * (0.25e0 + (0.75e0 * dl) / " +
        s"(CAST(sum_dl AS DOUBLE) / nd)))) * " +
        s"((nd - dfq_$i + 0.5e0) / (dfq_$i + 0.5e0))")
      .mkString("(", " + ", ")")
    val scored = tf
      .join(spans, Seq(idCol))
      .join(dls, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .crossJoin(broadcast(dfreq))
      .withColumn("score", expr(
        s"$bm25 * (1e0 + 1e0 / (1e0 + CAST(span - $n AS DOUBLE)))"))
      .select(col(idCol), col("span"), col("score"))
    graft.plans.ParallelRank.rowNumber(scored, "rnk", 32,
        col("score").desc, col(idCol).asc)
      .filter(col("rnk") <= k)
      .select(col(idCol), col("span"), col("score"), col("rnk"))
  }

  /** Phrase match WITHOUT an index: a pure higher-order-function scan —
    * per row, test every window of |phrase| consecutive tokens. One
    * narrow corpus pass, zero shuffles before the final aggregate; the
    * right plan when the phrase is ad-hoc and no postings table exists
    * (building one would itself cost the same corpus pass this spends).
    * Same output contract as [[phraseQuery]]. */
  def phraseScan(df: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val n = phrase.size
    val arr = phrase.map(w =>
      w.replace("\\", "\\\\").replace("'", "\\'"))
      .map(w => s"'$w'").mkString("array(", ", ", ")")
    withTokens(df, textCol)
      .withColumn("hits", expr(
        // sequence(1, 0) DESCENDS in Spark — the CASE guards docs
        // shorter than the phrase from producing phantom windows
        s"""CASE WHEN size(toks) >= $n THEN
              filter(
                sequence(1, size(toks) - ${n - 1}),
                s -> forall(sequence(1, $n),
                            j -> toks[s + j - 2] = $arr[j - 1]))
            ELSE array() END"""))
      .filter(size(col("hits")) > 0)
      .select(col(idCol),
        size(col("hits")).cast("long").as("n_hits"),
        element_at(col("hits"), 1).cast("long").as("first_pos"))
  }
}
