package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: find records that refer to the same real-world entity
  * despite textual drift (typos, truncation, re-keying).
  *
  * Scale design: the classic two-phase shape — BLOCK then VERIFY. The
  * O(n²) comparison space is cut to within-block pairs by an equi-join
  * on cheap deterministic blocking keys (exactly the partitioning Spark
  * shuffles on, so blocks are processed in parallel and never
  * co-resident); the expensive string-distance verify runs only inside
  * blocks. Block-size skew is the operator's hotspot — choose blocking
  * keys with bounded fan-out (e.g. region + name prefix), the same
  * discipline as [[Dedup.minhashCandidates]]'s `maxBucket`.
  */
object Linkage {

  /** Self-linkage within one table: candidate pairs share every
    * `blockCols` value, verified by `levenshtein(name) <= maxEdit`
    * (codegen'd built-in — no UDF). Returns (id_a, id_b, edit_dist).
    *
    * Two deliberate physical choices, each worth an order of magnitude
    * on the verify stage:
    *  - SHUFFLE_HASH hint: without it Catalyst broadcasts the (small)
    *    build side and the O(block²) levenshtein work runs on the probe
    *    side's SCAN partitioning — a handful of parquet splits — instead
    *    of fanning out over the block keys (measured 26 s → ~2 s at
    *    sf0.1 on local[32]).
    *  - THRESHOLDED levenshtein: the bounded DP early-exits at
    *    `maxEdit` (O(len·maxEdit) band instead of O(len²) table) and
    *    returns -1 past the bound, which the filter drops; surviving
    *    pairs carry the exact distance, so results are unchanged. */
  def linkWithin(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String], maxEdit: Int): DataFrame = {
    // every column is renamed PER SIDE before the condition is built:
    // a(c) === b(c) over two projections of the same frame resolves to
    // one attribute id and Spark logs "trivially true equals predicate"
    // (it then disambiguates correctly, but the warning is noise the
    // bench tail must stay clean of)
    def side(tag: String) = df.select(
      (col(idCol).as(s"id_$tag") +: col(nameCol).as(s"name_$tag") +:
        blockCols.map(c => col(c).as(s"__bk_${c}_$tag"))): _*)
    val a = side("a")
    val b = side("b").hint("shuffle_hash")
    val cond = blockCols.map(c =>
      col(s"__bk_${c}_a") === col(s"__bk_${c}_b")).reduce(_ && _) &&
      (col("id_a") < col("id_b"))
    a.join(b, cond)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b"), maxEdit).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist").between(0, maxEdit))
  }

  /** Symmetric-delete linkage (the FastSS / SymSpell family) for
    * `maxEdit = 1`: each name emits its 1-DELETION NEIGHBORHOOD (the
    * name itself plus every single-char-deleted variant) as join keys;
    * two names within edit distance 1 PROVABLY share a key (equal →
    * full key; substitution at i → both i-deleted variants coincide;
    * insert/delete → the longer one's deletion equals the shorter), so
    * the key equi-join is a complete candidate generator and the
    * levenshtein verify only ever runs on genuine near-matches.
    *
    * Scale: replaces the O(block²) comparison space of [[linkWithin]]
    * with rows × (len+1) keys — candidates are driven by ACTUAL
    * near-matches, not block size (measured ~10 s → sub-second on the
    * same sf0.1 input); per-key fan-out is bounded by how many strings
    * can collapse onto one deletion variant (tiny), so there is no
    * mega-bucket risk. Results are verified-identical to the blocked
    * form (spec) and to the oracle's brute within-block SQL. */
  def linkWithinDeletes(df: DataFrame, idCol: String, nameCol: String,
      blockCols: Seq[String]): DataFrame = {
    val keyed = df.select(
      (col(idCol).as("id") +: col(nameCol).as("name") +:
        blockCols.map(col)): _*)
      // guard: sequence(1, 0) steps DOWNWARD for empty names (Spark
      // sequence semantics) — emit just the full-name key instead
      .withColumn("k", explode(expr(
        "IF(length(name) < 1, array(name), " +
          "concat(array(name), transform(sequence(1, length(name)), " +
          "i -> concat(substring(name, 1, cast(i - 1 AS INT)), " +
          "substring(name, cast(i + 1 AS INT), length(name))))))")))
      // hash-before-shuffle: the deletion variants are near-full-length
      // strings, so the self-join would exchange and sort-compare ~len
      // bytes per key; an 8-byte polyHash moves the same candidate
      // structure for a fraction of the shuffle. True <=1-edit pairs
      // share an exact variant (hence its hash); a hash collision can
      // only ADD candidates, which the levenshtein verify then rejects —
      // results are provably identical (LinkageSpec checks vs the
      // blocked brute form)
      .withColumn("kh", graft.functions.GraftFunctions.polyHash(col("k")))
      .drop("k")
    // per-side renames for the same reason as linkWithin: a self-join
    // condition built from one frame's attribute ids logs trivially-
    // true-predicate warnings before Spark disambiguates it
    def side(tag: String) = keyed.select(
      (col("id").as(s"id_$tag") +: col("name").as(s"name_$tag") +:
        col("kh").as(s"kh_$tag") +:
        blockCols.map(c => col(c).as(s"__bk_${c}_$tag"))): _*)
    val a = side("a")
    // SHUFFLE_HASH: without the hint the ~MB-sized build side gets
    // broadcast and the whole join + verify runs at the PROBE side's
    // scan parallelism — one parquet split at small SFs, one task (same
    // trap as linkWithin; the exchange on kh is what fans the work out)
    val b = side("b").hint("shuffle_hash")
    val cond = (blockCols.map(c =>
      col(s"__bk_${c}_a") === col(s"__bk_${c}_b")) :+
      (col("kh_a") === col("kh_b")) :+
      (col("id_a") < col("id_b"))).reduce(_ && _)
    a.join(b, cond)
      .select("id_a", "id_b", "name_a", "name_b").distinct()
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b"), 1).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist").between(0, 1))
  }

  /** CROSS-TABLE symmetric-delete linkage at `maxEdit = 1`: link
    * entities of two different source tables whose (normalized) names
    * are within one edit — the entity-resolution step of merging two
    * corpora/systems whose keys carry source-specific formatting.
    *
    * Both inputs must be pre-projected to the same column names
    * (`idCol`, `nameCol`, `blockCols`) — normalization (prefix
    * stripping, casefolding) belongs to the caller, where the
    * source-specific rules live. Same completeness proof and hashed-key
    * shuffle as [[linkWithinDeletes]]; the only structural difference
    * is no `id < id` tie-break (the sides are distinct tables) and ids
    * surface as (id_l, id_r).
    *
    * Scale: candidates are generated per shared deletion-key, so the
    * cost tracks actual near-matches, not |left| × |right|; neither
    * side is assumed to fit in memory (shuffle hash join, no
    * broadcast). */
  def linkAcrossDeletes(left: DataFrame, right: DataFrame,
      idCol: String, nameCol: String, blockCols: Seq[String]): DataFrame = {
    def keyed(df: DataFrame, tag: String) = df.select(
      (col(idCol).as(s"id_$tag") +: col(nameCol).as(s"name_$tag") +:
        blockCols.map(col)): _*)
      .withColumn("k", explode(expr(
        s"IF(length(name_$tag) < 1, array(name_$tag), " +
          s"concat(array(name_$tag), transform(sequence(1, length(name_$tag)), " +
          s"i -> concat(substring(name_$tag, 1, cast(i - 1 AS INT)), " +
          s"substring(name_$tag, cast(i + 1 AS INT), length(name_$tag))))))")))
      .withColumn(s"kh_$tag",
        graft.functions.GraftFunctions.polyHash(col("k")))
      .drop("k")
    val a = keyed(left, "l")
    val b = keyed(right, "r").hint("shuffle_hash")
    // the sides are distinct tables, so only the shared-name block and
    // key columns need side-tagged references; kh is renamed per side
    // at construction (the caller may pass the SAME frame twice)
    val cond = (blockCols.map(c => a(c) === b(c)) :+
      (col("kh_l") === col("kh_r"))).reduce(_ && _)
    a.join(b, cond)
      .select("id_l", "id_r", "name_l", "name_r").distinct()
      .select(col("id_l"), col("id_r"),
        levenshtein(col("name_l"), col("name_r"), 1).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist").between(0, 1))
  }
}
