package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (e.g. the near-dup candidate graph
  * produced by [[Dedup.minhashCandidates]]).
  *
  * Scale design: every round is ONE shuffle of the edge list (join on
  * `src`, re-aggregate on `dst`); the per-node state table is one row
  * per node and rides the same hash partitioning. No adjacency matrix,
  * no driver-side graph — edges stream through joins, so the operator
  * survives graphs that don't fit on any single machine.
  */
object Graph {

  /** Bounded-round PageRank in FIXED-POINT arithmetic.
    *
    * Ranks are BIGINTs scaled by `scale` (default 1e12); each round is
    *   contrib(u->v) = rank_fx(u) div outdeg(u)
    *   rank_fx'(v)   = (15 * scale) div (100 * N) + (85 * sum(contrib)) div 100
    * — all integer ops. Why fixed-point instead of doubles: IEEE
    * addition is not associative, so a double `sum` depends on partition
    * order and can never hash-match a different engine (or even a rerun
    * with different partitioning). BIGINT sums are exact and
    * order-independent, which makes the operator DETERMINISTIC on a
    * cluster — the property matters well beyond oracle parity. The
    * quantization error per round is < outdeg ulps of 1e-12 — noise far
    * below the 0.15/0.85 damping structure.
    *
    * Rounds are bounded (no driver-side convergence loop on unbounded
    * data) and each round `localCheckpoint`s the (tiny) rank table to cut
    * lineage — same discipline as [[Dedup.clusters]].
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    // persist: the edge list feeds the degree agg plus one join per round
    val e = Dedup.persistTracked(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val deg = Dedup.persistTracked(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(n))
      .selectExpr("id", s"${scale}L div n_nodes AS rank_fx", "n_nodes")
      .transform(Dedup.checkpointTracked)
    for (_ <- 1 to rounds) {
      val contrib = e.join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("rank_fx")), "src")
        .select(col("dst"), expr("rank_fx div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = ranks.join(contrib, ranks("id") === contrib("dst"), "left")
        .select(ranks("id"),
          expr(s"(15 * ${scale}L) div (100 * n_nodes) + " +
            "(85 * coalesce(s, 0L)) div 100").as("rank_fx"),
          ranks("n_nodes"))
        .transform(Dedup.checkpointTracked)
    }
    ranks.select(col("id"), col("rank_fx"),
      (col("rank_fx").cast("double") / lit(scale.toDouble)).as("pagerank"))
  }

  /** PERSONALIZED PageRank: the teleport mass returns to the SEED set
    * instead of spreading uniformly — rank becomes proximity to the
    * seeds (the similar-items / trust-propagation primitive; this is
    * the random-walk-with-restart the recommendation literature builds
    * on). Same fixed-point discipline as [[pagerank]]: BIGINT ranks
    * scaled by `scale`, integer division everywhere, exact
    * order-independent sums — deterministic on a cluster and
    * hash-matchable against an unrolled oracle. Seeds ride as a
    * broadcast membership flag; each round is the one edge-shuffle
    * contribution join.
    *
    *   rank'(v) = [v∈S]·(15·scale) div (100·|S|)
    *            + (85·Σ_{u→v} rank(u) div outdeg(u)) div 100
    */
  def personalizedPagerank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      rounds: Int = 3, scale: Long = 1000000000000L): DataFrame = {
    val e = Dedup.persistTracked(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val deg = Dedup.persistTracked(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val s = seeds.select(col(seedCol).as("id")).distinct()
      .transform(Dedup.persistTracked)
    val nodes = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val nSeeds = s.agg(count(lit(1)).as("n_seeds"))
    var ranks = nodes
      .join(broadcast(s.withColumn("is_seed", lit(1L))), Seq("id"), "left")
      .crossJoin(broadcast(nSeeds))
      .selectExpr("id", "coalesce(is_seed, 0L) AS is_seed", "n_seeds",
        s"(coalesce(is_seed, 0L) * ${scale}L) div n_seeds AS rank_fx")
      .transform(Dedup.checkpointTracked)
    for (_ <- 1 to rounds) {
      val contrib = e.join(deg, "src")
        .join(ranks.select(col("id").as("src"), col("rank_fx")), "src")
        .select(col("dst"), expr("rank_fx div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = ranks.join(contrib, ranks("id") === contrib("dst"), "left")
        .select(ranks("id"), ranks("is_seed"), ranks("n_seeds"),
          expr(s"(is_seed * 15 * ${scale}L) div (100 * n_seeds) + " +
            "(85 * coalesce(s, 0L)) div 100").as("rank_fx"))
        .transform(Dedup.checkpointTracked)
    }
    ranks.select(col("id"), col("rank_fx"),
      (col("rank_fx").cast("double") / lit(scale.toDouble)).as("ppr"))
  }

  /** Multi-source BFS hop distance, bounded to `maxHops` rounds.
    *
    * Classic frontier expansion: round r joins ONLY the nodes first
    * discovered at round r-1 against the edge list, then folds the new
    * labels in with a `min(hop)` re-aggregation. Each round is one
    * shuffle of (frontier ⋈ edges) + one of the label table — the label
    * table and the join both hash-partition on the node id, so the agg
    * reuses the join's exchange. All-integer labels → bit-identical
    * across engines and reruns (same argument as [[pagerank]]).
    *
    * Scale: state is one row per *reached* node, frontier work is
    * proportional to the frontier's out-edges (not the whole graph), and
    * `checkpointTracked` cuts the per-round lineage growth that would
    * otherwise re-plan r joins at round r. Seeds absent from the edge
    * list surface with hop 0 and never expand — harmless.
    *
    * Rounds are bounded by design: on unbounded data a driver-side
    * convergence loop is an unbounded job count. For unknown-diameter
    * graphs compose with the fixpoint pattern used by the
    * connected-components variant (empty-frontier early exit).
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int = 4): DataFrame = {
    // persist: the edge list feeds one join per round
    val e = Dedup.persistTracked(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    var dist = seeds.select(col(seedCol).as("id")).distinct()
      .withColumn("hop", lit(0L))
      .transform(Dedup.checkpointTracked)
    for (r <- 1 to maxHops) {
      val frontier = dist.filter(col("hop") === (r - 1).toLong)
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"), lit(r.toLong).as("hop"))
      dist = dist.unionAll(next)
        .groupBy(col("id")).agg(min(col("hop")).as("hop"))
        .transform(Dedup.checkpointTracked)
    }
    dist
  }

  /** Bounded-round k-CORE peel: repeatedly drop nodes of degree < k
    * (with the edges touching them), `rounds` times. The true k-core is
    * the fixed point; bounded rounds give the standard distributed
    * approximation from above (every surviving node HAS degree ≥ k in
    * the current subgraph — supersets of the real core shrink toward it
    * monotonically each round).
    *
    * Input edges must be UNDIRECTED-expanded (both directions present),
    * as produced by the candidate-pair explode in the callers. Each
    * round is one degree aggregation plus two semi-joins of the edge
    * list against the (node-count-sized) survivor table — no node ever
    * sees more than its own adjacency, so the operator survives graphs
    * with no single-machine representation. `checkpointTracked` cuts
    * the per-round lineage (same discipline as [[pagerank]]); the peel
    * is pure integer counting, so results are bit-identical across
    * partitionings and engines.
    *
    * Returns surviving (id, deg) — degree within the peeled subgraph.
    */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int = 3): DataFrame = {
    var e = Dedup.checkpointTracked(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    for (_ <- 1 to rounds) {
      // persist: the survivor set feeds BOTH semi-joins (the
      // multi-consumer recompute trap — see Dedup.minhashCandidates)
      val keep = Dedup.persistTracked(
        e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .select(col("src").as("id")))
      e = Dedup.checkpointTracked(
        e.join(keep.withColumnRenamed("id", "src"), "src", "leftsemi")
          .join(keep.withColumnRenamed("id", "dst"), "dst", "leftsemi")
          .select(col("src"), col("dst")))
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Link prediction by common-neighbor evidence: for node pairs NOT
    * already adjacent, count shared neighbors and score them with the
    * resource-allocation index Σ_z 1/deg(z) — in FIXED-POINT
    * (`1e9 div deg`, exact BIGINT sums) for the same
    * order-independence reason as [[pagerank]]. Returns the `topK`
    * (src, dst, common, ra_score_fx) pairs by score, ties broken by
    * (src, dst) so the cut is a total order.
    *
    * Scale shape: wedges are enumerated THROUGH their center —
    * a self-join of the adjacency list grouped by the middle node — so
    * the work is Σ_z deg(z)², which a single viral hub turns quadratic.
    * `maxHubDegree` caps it: hubs above the cap are excluded as wedge
    * CENTERS (endpoints are unaffected). That is also the principled
    * choice, not just the cheap one — a shared neighbor of degree
    * 100 000 carries ~0 evidence (1/deg ≈ 0), which is the whole point
    * of the RA/Adamic-Adar weighting; dropping it changes scores by
    * less than one fixed-point unit per wedge at the default cap. */
  def linkPredict(edges: DataFrame, srcCol: String, dstCol: String,
      maxHubDegree: Long = 1000L, topK: Int = 20): DataFrame = {
    require(maxHubDegree >= 1, s"maxHubDegree must be >= 1")
    require(topK >= 1, s"topK must be >= 1")
    val sym = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v")).distinct()
      .transform(Dedup.persistTracked)
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    // adjacency with the center's fixed-point weight attached; hubs
    // above the cap never become centers
    val adj = sym.join(deg.filter(col("deg") <= maxHubDegree), Seq("u"))
      .select(col("u").as("z"), col("v").as("n"),
        expr("1000000000L div deg").as("wz"))
    val wedges = adj.select(col("z"), col("n").as("a"), col("wz"))
      .join(adj.select(col("z"), col("n").as("b")), Seq("z"))
      .filter(col("a") < col("b"))
    val scored = wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"), sum(col("wz")).as("ra_score_fx"))
    scored
      .join(sym.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "leftanti") // only NOT-yet-linked pairs
      .orderBy(col("ra_score_fx").desc, col("a"), col("b"))
      .limit(topK)
      .select(col("a").as(srcCol), col("b").as(dstCol),
        col("common"), col("ra_score_fx"))
  }
}
