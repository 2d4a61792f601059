package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.XFormulas.P

/** Broadcast Bloom-filter join pruning.
  *
  * The 100 TB pattern: a fact⋈dim join where the dim side's key set is
  * too large to broadcast exactly (a billion distinct keys won't fit in
  * an executor), but a fixed-size Bloom filter of it will. The fact side
  * is pre-filtered map-side — no shuffle, no extra scan — so only rows
  * that MIGHT match reach the join's exchange. False positives are
  * removed by the exact join that follows, so the composed result is
  * exactly the plain join (which is also why the DuckDB oracle for the
  * pruned join is simply the unpruned SQL).
  *
  * Spark itself applies this idea in `InjectRuntimeFilter`; this operator
  * makes it explicit and tunable (m, k), and keeps every hash in portable
  * integer arithmetic so the filter's *statistics* (`stats`) have an
  * exact cross-engine oracle too.
  *
  * Sizing: with n distinct dim keys, m ≈ n·k/ln2 bits gives FPP ≈ 2^-k.
  * The bit array is m/64 longs — m = 2^20 is 128 KiB, broadcast-trivial
  * regardless of dim cardinality. Building it shuffles at most k·n
  * position longs and the driver collects at most m distinct positions
  * (bounded by the filter size, like the k-means codebook collect — this
  * is the legitimate kind of driver collect).
  *
  * Hashing (Kirsch–Mitzenmacher double hashing, all mod-P integer math so
  * DuckDB can replicate it bit-for-bit): for a non-negative BIGINT key
  *   h1 = (key · 2654435761) mod P
  *   h2 = ((key · 40503 + 7919) mod P) + 1
  *   pos_i = (h1 + i·h2) mod m,  i ∈ [0, k)
  * Keys must stay below 2^63/2654435761 ≈ 3.5e9 to avoid overflow —
  * fine for surrogate keys; hash wider domains to a BIGINT first.
  */
object Bloom {

  /** SQL expression: array of the k Bloom positions for a BIGINT key. */
  def positionsSql(key: String, m: Int, k: Int): String =
    s"transform(sequence(0L, ${k - 1}L), i -> " +
      s"((($key * 2654435761) % $P) + i * ((($key * 40503 + 7919) % $P) + 1)) % $m)"

  /** DuckDB equivalent of [[positionsSql]] (same integer math; the `i`
    * comes from a `range(0, k)` lateral in the caller's CTE). */
  def duckPositionSql(key: String, i: String, m: Int, k: Int): String =
    s"((($key * 2654435761) % $P) + $i * ((($key * 40503 + 7919) % $P) + 1)) % $m"

  /** The filter's set bit positions as a DataFrame of `pos: BIGINT` —
    * a distinct-aggregate of at most m values, never wider than the
    * filter itself no matter how large `dim` is. */
  def bitPositions(dim: DataFrame, dimKey: String, m: Int, k: Int): DataFrame =
    dim.select(col(dimKey)).distinct()
      .selectExpr(s"explode(${positionsSql(dimKey, m, k)}) AS pos")
      .distinct()

  /** Build the bit mask (m/64 longs) on the driver. Bounded by m bits. */
  def buildMask(dim: DataFrame, dimKey: String, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0 && m > 0, s"bloom m must be a positive multiple of 64, got $m")
    val mask = new Array[Long](m / 64)
    bitPositions(dim, dimKey, m, k).collect().foreach { r =>
      val p = r.getLong(0)
      mask((p >> 6).toInt) |= 1L << (p & 63)
    }
    mask
  }

  /** `might_contain` as a codegen'd SQL predicate over an inline mask
    * literal: every one of the key's k positions has its bit set. Kept as
    * the pure-SQL formulation (usable from `spark.sql` text); the Column
    * paths below use the native [[graft.functions.expressions.BloomMightContain]]
    * expression instead — same bits, but the mask rides as one referenced
    * long[] with an early-exit loop rather than per-batch HOF lambdas. */
  def mightContainSql(key: String, mask: Array[Long], m: Int, k: Int): String = {
    val maskSql = mask.mkString("array(", "L,", "L)")
    s"forall(${positionsSql(key, m, k)}, p -> " +
      s"(element_at($maskSql, cast(shiftright(p, 6) AS int) + 1) & " +
      s"shiftleft(cast(1 AS bigint), cast(p & 63 AS int))) <> 0)"
  }

  /** Membership Column for a pre-built mask (native codegen'd test). */
  def mightContain(key: Column, mask: Array[Long], k: Int): Column =
    graft.functions.GraftFunctions.bloomContains(key, mask, k)

  /** Fact rows that pass the Bloom filter built from `dim`'s keys —
    * a map-side narrow filter in the fact scan's own stage. */
  def prune(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            m: Int = 1 << 16, k: Int = 5): DataFrame =
    fact.filter(mightContain(col(factKey), buildMask(dim, dimKey, m, k), k))

  /** Bloom-pruned equi join: prune the fact side, then join exactly.
    * Result is EXACTLY `fact ⋈ dim` — false positives die in the join. */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
                 m: Int = 1 << 16, k: Int = 5): DataFrame =
    prune(fact, factKey, dim, dimKey, m, k)
      .join(dim, col(factKey) === col(dimKey))

  /** Bloom-accelerated NOVELTY FILTER — the exact-dedup ingest path:
    * keep the incoming rows whose key does NOT appear in `base`.
    *
    * The 100 TB shape: `base` is the standing corpus's fingerprint set
    * (billions of keys), the increment is small. A plain anti join
    * shuffles the ENTIRE increment against the base's key exchange. With
    * the Bloom mask of the base (fixed size, broadcast-trivial), rows
    * that FAIL the filter are *definitely novel* — a Bloom filter has no
    * false negatives — and short-circuit to the output from the scan's
    * own stage, never entering an exchange. Only the (few) rows that
    * pass — true duplicates plus the ~2^-k false-positive sliver — go
    * through the exact anti join. The composed result is EXACTLY
    * `newDf ANTI JOIN base`, which is also its oracle.
    *
    * With a well-sized mask the exchange carries |dup| + FPP·|new| rows
    * instead of |new| — for a 1%-duplicate crawl increment that is a
    * ~99% cut of the ingest-side shuffle.
    *
    * `newDf` is consumed by BOTH branches and `base` by both the mask
    * build and the anti join — persist them if their lineage is
    * expensive (e.g. a fingerprint computed from raw text), or pass
    * narrow pre-hashed projections. */
  def noveltyFilter(newDf: DataFrame, newKey: String,
                    base: DataFrame, baseKey: String,
                    m: Int = 1 << 16, k: Int = 5): DataFrame = {
    val mask = buildMask(base, baseKey, m, k)
    val might = mightContain(col(newKey), mask, k)
    val definite = newDf.filter(!might)
    val maybe = newDf.filter(might)
      .join(base.select(col(baseKey)).distinct(),
        col(newKey) === col(baseKey), "left_anti")
    definite.unionByName(maybe)
  }

  /** One-row filter quality report: bits set, fact rows scanned, rows
    * passing the Bloom filter, true matches, and false positives. Every
    * count is exact integer arithmetic with a DuckDB-replicable oracle. */
  def stats(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
            m: Int = 1 << 16, k: Int = 5): DataFrame = {
    val mask = buildMask(dim, dimKey, m, k)
    val bitsSet = mask.map(java.lang.Long.bitCount).sum.toLong
    val dimKeys = dim.select(col(dimKey).as("k")).distinct()
    fact
      .withColumn("bloom_pass",
        mightContain(col(factKey), mask, k).cast("int").cast("long"))
      .join(dimKeys, col(factKey) === col("k"), "left")
      .withColumn("true_match", when(col("k").isNotNull, 1L).otherwise(0L))
      .agg(
        count(lit(1)).as("fact_rows"),
        sum(col("bloom_pass")).as("bloom_pass"),
        sum(col("true_match")).as("true_match"))
      .select(
        lit(m.toLong).as("m"), lit(k.toLong).as("k_hashes"),
        lit(bitsSet).as("bits_set"),
        col("fact_rows"), col("bloom_pass"), col("true_match"),
        (col("bloom_pass") - col("true_match")).as("false_pos"))
  }
}
