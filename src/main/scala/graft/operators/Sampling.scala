package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.XFormulas._

/** Deterministic corpus sampling for training-data pipelines.
  *
  * Both operators key every random choice off the portable polynomial
  * string hash ([[graft.functions.XFormulas.sparkStrHash]]) so the same
  * document set always yields the same sample — re-runs are reproducible
  * and the DuckDB oracle replicates the selection bit-for-bit.
  */
object Sampling {

  /** Per-domain quota (the Common-Crawl-style "at most n pages per
    * domain" cap): keep at most `n` docs per source, chosen pseudo-
    * randomly by hash rank.
    *
    * Scale design — the naive single window
    * `row_number() OVER (PARTITION BY source ORDER BY hash)` shuffles the
    * ENTIRE corpus by source and rams every row of a mega-domain through
    * one task. Instead, two phases:
    *
    *  1. a tiny per-source count aggregate (map-side partials, output =
    *     #sources rows) broadcast back, driving a HASH PRE-FILTER:
    *     keep a row iff `hash < (margin·n·P) div src_n` — expected
    *     margin·n survivors per source, so the heavy window input shrinks
    *     from |corpus| to ~margin·n·#sources no matter how skewed the
    *     domains are;
    *  2. the exact window on the survivors.
    *
    * The pre-filter keeps exactly the margin·n/src_n-quantile of the hash
    * order the window ranks by, so phase 2 sees every row that could rank
    * ≤ n unless a source's survivor count undershoots n — a tail event
    * bounded by Chernoff at margin 4 (P[Binomial(src_n, 4n/src_n) < n]
    * ≲ e^{-n}); for sources with src_n ≤ margin·n the threshold exceeds
    * the hash range, so small sources are never pre-filtered at all.
    * The composed operator is still fully deterministic (the oracle
    * replicates both phases).
    *
    * Returns survivors as (idCol, srcCol, rk) with rk ∈ [1, n]. */
  def domainQuota(docs: DataFrame, idCol: String, srcCol: String,
                  n: Int, margin: Int = 4): DataFrame = {
    require(n > 0 && margin > 0, s"domainQuota: need n>0, margin>0; got $n, $margin")
    val h = sparkStrHash(s"concat($srcCol, '#', cast($idCol AS string))")
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("src_n"))
    val capNP = margin.toLong * n * P // ≤ 4·n·1e9: no overflow for n < 2^31
    docs
      .withColumn("hk", expr(h))
      .join(broadcast(counts), srcCol)
      .filter(col("hk") < expr(s"$capNP div src_n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(srcCol)).orderBy(col("hk"), col(idCol))))
      .filter(col("rk") <= n)
      .select(col(idCol), col(srcCol), col("rk").cast("long").as("rk"))
  }

  /** DuckDB oracle for [[domainQuota]] over the `documents` table. */
  def domainQuotaOracle(n: Int, margin: Int = 4): String = {
    val h = duckStrHash("source || '#' || CAST(doc_id AS VARCHAR)")
    val capNP = margin.toLong * n * P
    s"""WITH c AS (SELECT source, COUNT(*) AS src_n FROM documents GROUP BY source),
       h AS (SELECT doc_id, documents.source, $h AS hk FROM documents JOIN c USING (source)
             WHERE $h < $capNP // src_n),
       r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
             FROM h)
       SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= $n"""
  }

  /** Spark SQL expression mapping `srcCol` to its BIGINT weight
    * (sources absent from the map get 0). */
  def weightExpr(srcCol: String, weights: Map[String, Long]): String =
    weights.toSeq.sortBy(_._1)
      .foldRight("CAST(0 AS bigint)") { case ((s, w), els) =>
        s"IF($srcCol = '${s.replace("'", "''")}', ${w}L, $els)"
      }

  /** Deterministic source-mixture resampling: given a target weight per
    * source (e.g. "books 3×, web 1×"), keep each doc with probability
    * proportional to its source's weight — selection by hash threshold,
    * so the sample is a pure function of (doc set, weights). Rates are
    * normalized so the largest weight keeps 100%: rate_s = w_s / max(w).
    * A doc survives iff hash(doc) · max_w < P · w_s (all BIGINT math —
    * exact, portable). Returns per-source (kept, total) counts.
    *
    * At 100 TB this is a single narrow map + tiny aggregate: no shuffle
    * of document payloads, the weights ride as a broadcast literal map. */
  def mixtureCounts(docs: DataFrame, idCol: String, srcCol: String,
                    weights: Map[String, Long]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "mixtureCounts: weights must be non-empty and non-negative")
    val maxW = weights.values.max
    require(maxW > 0, "mixtureCounts: at least one weight must be positive")
    val wExpr = weightExpr(srcCol, weights)
    val h = sparkStrHash(s"concat('mix#', cast($idCol AS string))")
    docs
      .withColumn("w", expr(wExpr))
      .withColumn("kept",
        (expr(h) * maxW < col("w") * P).cast("int").cast("long"))
      .groupBy(col(srcCol))
      .agg(sum(col("kept")).as("kept"), count(lit(1)).as("total"))
  }

  /** DETERMINISTIC GLOBAL TRAINING ORDER — the data-loader order file
    * that makes a run reproducible: every document gets a global
    * `position` (1-based) and a round-robin `shard`, such that
    *  - within a source, documents are consumed in HASH-STRIPED order
    *    (by the portable polynomial hash of the id — no accidental
    *    correlation with ingest order, crawl date, or id locality);
    *  - across sources, the order is MIXTURE-WEIGHTED stride
    *    scheduling: the k-th document of source s is consumed at
    *    virtual time (k−1)·S/w_s, so any prefix of the global order
    *    holds each source in ≈ w_s / Σw proportion — the data loader
    *    sees the mixture from step one, not source-by-source blocks;
    *  - `shard` = (position−1) mod nShards, so striping the order file
    *    across nShards loader workers preserves the interleave within
    *    each worker's subsequence.
    *
    * Pure integer arithmetic on a unique-key total order
    * (vt, source, id) — a pure function of (doc set, weights), bit-
    * identical at any physical partitioning (PartitionInvarianceSpec).
    * Documents of sources absent from `weights` (weight 0) are
    * EXCLUDED, matching the mixture semantics.
    *
    * Scale shape: one source-partitioned window for the within-source
    * rank (each source shards across tasks only as far as its own
    * rows), then ONE range exchange for the global position via
    * [[graft.plans.ParallelRank]] — never an unpartitioned window. */
  def trainOrder(docs: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Long], nShards: Int,
      parts: Int = 32): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "trainOrder: weights must be non-empty and non-negative")
    val h = sparkStrHash(s"concat('t:', cast($idCol AS string))")
    val bySrc = Window.partitionBy(col(srcCol))
      .orderBy(col("__h"), col(idCol))
    val keyed = docs
      .select(col(idCol), col(srcCol), expr(h).as("__h"))
      .withColumn("__w", expr(weightExpr(srcCol, weights)))
      .filter(col("__w") > 0L)
      .withColumn("__k", row_number().over(bySrc).cast("long"))
      .withColumn("__vt", expr("((__k - 1) * 100000000) div __w"))
    graft.plans.ParallelRank.rowNumber(keyed, "position", parts,
        col("__vt").asc, col(srcCol).asc, col(idCol).asc)
      .withColumn("shard", pmod(col("position") - 1L, lit(nShards.toLong)))
      .select(col(idCol), col("shard"), col("position"))
  }

  /** DuckDB oracle for [[mixtureCounts]] over the `documents` table. */
  def mixtureCountsOracle(weights: Map[String, Long]): String = {
    val maxW = weights.values.max
    val wExpr = weights.toSeq.sortBy(_._1)
      .foldRight("CAST(0 AS BIGINT)") { case ((s, w), els) =>
        s"CASE WHEN source = '${s.replace("'", "''")}' THEN ${w} ELSE $els END"
      }
    val h = duckStrHash("'mix#' || CAST(doc_id AS VARCHAR)")
    s"""SELECT source,
              CAST(SUM(CASE WHEN ($h) * $maxW < ($wExpr) * $P THEN 1 ELSE 0 END) AS BIGINT) AS kept,
              COUNT(*) AS total
       FROM documents GROUP BY source"""
  }
}
