package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial operators over planar (x, y) point sets — radius
  * self-join and density hotspots via GRID BUCKETING, the standard
  * distributed spatial shape (the same cell-join pattern PostGIS
  * tiling, GeoSpark/Sedona partitioning, and Uber's H3 pipelines use;
  * here on a square grid so every step is exact integer arithmetic).
  *
  * Scale design: a radius join is quadratic done naively. Assign each
  * point to a ⌈cell⌉-sized grid square; any pair within radius r ≤
  * cell lies in the same or an adjacent square, so candidates = the
  * 3×3 neighborhood join — ONE equi-shuffle on the cell key with a
  * constant ×9 probe-side fan-out (the explode ships 16-byte cell
  * keys, not payloads), then an exact distance verify on the
  * candidates. Cost is Σ|cell|·|neighborhood|, linear for any
  * bounded-density point set at any corpus size; a viral cell (every
  * point in one square) is the caller's cell-size bug, surfaced by
  * [[density]]'s hotspot readout rather than silently absorbed.
  *
  * Determinism: coordinates are whole-number doubles in the test
  * corpus and distances compare in exact BIGINT squared units — no
  * trig, no roots, so Spark and DuckDB agree bit-for-bit (haversine
  * would drift across libm implementations; planar-squared is the
  * oracle-safe core and the cell machinery is identical either way).
  */
object Spatial {

  /** All unordered pairs (id_a < id_b) within `radius`, by squared
    * Euclidean distance on integer-valued coordinates. Returns
    * (id_a, id_b, dist2: BIGINT). A pair within r spans at most
    * ⌈r/cell⌉ whole cells per axis, so the (2R+1)² neighborhood with
    * R = ⌈radius/cell⌉ is exhaustive for ANY radius/cell combination —
    * radius ≤ cell gives the classic 3×3, smaller cells trade a wider
    * (still constant) probe fan-out for thinner buckets. */
  def radiusJoin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long, cell: Long): DataFrame =
    candidatePairs(points, idCol, xCol, yCol, radius, cell)
      .select(col("id_a"), col("id_b"), col("dist2"))

  /** BIPARTITE radius join: all (left, right) pairs within `radius` —
    * points-to-facilities, events-to-sensors. Same grid mechanics as
    * [[radiusJoin]] (the left side probes the (2R+1)² neighborhood of
    * the right side's cells; one equi-shuffle, exact integer verify),
    * without the self-join's id ordering. Returns
    * (id_l, id_r, dist2: BIGINT). */
  def radiusJoinWith(left: DataFrame, leftId: String,
      leftX: String, leftY: String,
      right: DataFrame, rightId: String,
      rightX: String, rightY: String,
      radius: Long, cell: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    require(radius >= 0, s"radius must be non-negative, got $radius")
    val ring = ((radius + cell - 1) / cell).max(1L)
    val offs = (-ring to ring).map(o => s"${o}L").mkString(", ")
    val build = right.select(col(rightId).cast("long").as("id_r"),
      col(rightX).cast("long").as("bx"),
      col(rightY).cast("long").as("by"))
      .withColumn("cx", expr(s"floor(bx / ${cell}L)"))
      .withColumn("cy", expr(s"floor(by / ${cell}L)"))
    val probe = left.select(col(leftId).cast("long").as("id_l"),
      col(leftX).cast("long").as("ax"),
      col(leftY).cast("long").as("ay"))
      .withColumn("off", explode(expr(s"array($offs)")))
      .withColumn("off2", explode(expr(s"array($offs)")))
      .select(col("id_l"), col("ax"), col("ay"),
        (expr(s"floor(ax / ${cell}L)") + col("off")).as("cx"),
        (expr(s"floor(ay / ${cell}L)") + col("off2")).as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_l"), col("id_r"), col("dist2"))
  }

  /** Grid-keyed state rows for the streaming spatial gate: each point
    * with its grid cell under a FROZEN cell size (a layout constant of
    * the state table, like any index's shard function) and the packed
    * 64-bit cell key (`ck = xxhash64(cx, cy)`) the state is BUCKETED by
    * at rest. Hash collisions on ck are harmless: the join keeps the
    * exact (cx, cy) equality as a residual and the integer dist²
    * verify is exact. */
  def gridKeyed(df: DataFrame, idCol: String, xCol: String,
      yCol: String, cell: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    df.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .withColumn("cx", expr(s"floor(x / ${cell}L)"))
      .withColumn("cy", expr(s"floor(y / ${cell}L)"))
      .withColumn("ck", xxhash64(col("cx"), col("cy")))
  }

  /** [[radiusJoinWith]] against PRE-KEYED state ([[gridKeyed]] rows,
    * typically a bucketed state table): the probe side explodes to its
    * (2R/c+1)² neighbor cells and equi-joins on `ck` ALONE — the state
    * scan's at-rest HashPartitioning(ck) then matches the join's
    * clustering keys EXACTLY, so the accumulated state never exchanges;
    * only the increment does. The exact (cx, cy) cell equality (which
    * de-dups xxhash64 collisions) rides as a NON-EQUI residual
    * (`cx_l − cx_r = 0`): written as plain equalities it would be
    * lifted into the join keys, and Spark's co-partition rule
    * (`requireAllClusterKeysForCoPartition`, default true) requires
    * the partitioning to cover ALL join keys — a (ck, cx, cy) key set
    * re-exchanges the whole state through every batch, the exact
    * failure ShuffleBudgetSpec's spatial pin measures. The probe
    * carries the shuffle_hash hint (build side), the state streams.
    * Returns (id_l, id_r, dist2). */
  def radiusJoinKeyed(left: DataFrame, leftId: String, leftX: String,
      leftY: String, keyed: DataFrame, radius: Long,
      cell: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    require(radius >= 0, s"radius must be non-negative, got $radius")
    val ring = ((radius + cell - 1) / cell).max(1L)
    val offs = (-ring to ring).map(o => s"${o}L").mkString(", ")
    val probe = left.select(col(leftId).cast("long").as("id_l"),
      col(leftX).cast("long").as("ax"),
      col(leftY).cast("long").as("ay"))
      .withColumn("off", explode(expr(s"array($offs)")))
      .withColumn("off2", explode(expr(s"array($offs)")))
      .select(col("id_l"), col("ax"), col("ay"),
        (expr(s"floor(ax / ${cell}L)") + col("off")).as("acx"),
        (expr(s"floor(ay / ${cell}L)") + col("off2")).as("acy"))
      .withColumn("ck", xxhash64(col("acx"), col("acy")))
    probe.hint("shuffle_hash")
      .join(keyed.select(col("id").as("id_r"), col("x").as("bx"),
        col("y").as("by"), col("cx"), col("cy"), col("ck")),
        Seq("ck"))
      .filter((col("acx") - col("cx")) === 0L &&
        (col("acy") - col("cy")) === 0L)
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_l"), col("id_r"), col("dist2"))
  }

  /** Up to `k` nearest RIGHT points per LEFT point among those within
    * `radius` — "nearest facility" (ties by right id). Returns
    * (id_l, id_r, dist2, knn_rank). Same exactness contract as
    * [[knnWithin]]: the radius bound makes the grid candidate set
    * provably complete, and the rank window partitions by the left id,
    * never globally. */
  def nearestWithin(left: DataFrame, leftId: String,
      leftX: String, leftY: String,
      right: DataFrame, rightId: String,
      rightX: String, rightY: String,
      radius: Long, cell: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    radiusJoinWith(left, leftId, leftX, leftY,
        right, rightId, rightX, rightY, radius, cell)
      .withColumn("knn_rank", row_number().over(
        Window.partitionBy(col("id_l"))
          .orderBy(col("dist2"), col("id_r"))).cast("long"))
      .filter(col("knn_rank") <= k)
  }

  /** [[radiusJoin]] with coordinates kept on both sides — internal
    * feed for [[dbscan]], which re-derives grid cells from them. */
  private def candidatePairs(points: DataFrame, idCol: String,
      xCol: String, yCol: String, radius: Long, cell: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    require(radius >= 0, s"radius must be non-negative, got $radius")
    val ring = ((radius + cell - 1) / cell).max(1L)
    val offs = (-ring to ring).map(o => s"${o}L").mkString(", ")
    val pts = points.select(
      col(idCol).cast("long").as("pid"),
      col(xCol).cast("long").as("px"),
      col(yCol).cast("long").as("py"))
    val build = pts.select(col("pid").as("id_b"), col("px").as("bx"),
      col("py").as("by"),
      expr(s"floor(px / ${cell}L)").as("cx"),
      expr(s"floor(py / ${cell}L)").as("cy"))
    // probe side: each point visits its (2R+1)^2-cell neighborhood; the
    // exploded frame carries only (id, x, y, cell) — constant width
    val probe = pts
      .select(col("pid").as("id_a"), col("px").as("ax"),
        col("py").as("ay"),
        expr(s"floor(px / ${cell}L)").as("cx0"),
        expr(s"floor(py / ${cell}L)").as("cy0"))
      .withColumn("off", explode(expr(s"array($offs)")))
      .withColumn("off2", explode(expr(s"array($offs)")))
      .select(col("id_a"), col("ax"), col("ay"),
        (col("cx0") + col("off")).as("cx"),
        (col("cy0") + col("off2")).as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= lit(radius * radius))
      .select(col("id_a"), col("ax"), col("ay"),
        col("id_b"), col("bx"), col("by"), col("dist2"))
  }

  /** Up to `k` nearest neighbors per point among those within `radius`
    * (ties broken by neighbor id). Returns (id, nbr, dist2, knn_rank).
    *
    * The radius bound is what makes a grid kNN EXACT: an unbounded kNN
    * can have its k-th neighbor arbitrarily far away, so no fixed cell
    * neighborhood is exhaustive — bounding the search to r ≤ cell makes
    * the 3×3 candidate set provably complete, and the rank window runs
    * PARTITIONED BY point id (thousands of concurrent tiny sorts, never
    * a global one). The classic index-accelerated kNN-join shape. */
  def knnWithin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long, cell: Long, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pairs = radiusJoin(points, idCol, xCol, yCol, radius, cell)
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nbr"), col("dist2")),
        struct(col("id_b").as("id"), col("id_a").as("nbr"), col("dist2"))))
        .as("e"))
      .select(col("e.id").as("id"), col("e.nbr").as("nbr"), col("e.dist2"))
    sym.withColumn("knn_rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("dist2"), col("nbr")))
        .cast("long"))
      .filter(col("knn_rank") <= k)
  }

  /** Deterministic DBSCAN over integer-valued planar points: clusters
    * are connected components of the core-point eps-graph, border
    * points attach to the MINIMUM neighboring core cluster (classic
    * DBSCAN leaves border assignment scan-order-dependent; taking the
    * min makes the output a pure function of the input, so it can be
    * hash-checked against an oracle). Returns (id, role, cluster) with
    * role ∈ {core, border, noise}; cluster is the component's minimum
    * core id, -1 for noise.
    *
    * Scale shape — exact GRID DBSCAN (Gunawan's construction): the
    * grid uses g = ⌊eps/√2⌋ so a cell's diagonal is ≤ eps and every
    * cell is a CLIQUE of the eps-graph. Connectivity then reduces to
    * the CELL graph — cores in one cell are connected for free, and one
    * witnessing core pair connects two cells' cliques wholesale — so
    * [[Dedup.clustersStar]] runs on distinct touching cell pairs
    * (|cells| ≪ |points|, each with ≤ ~21 neighbors) instead of the
    * per-point eps-graph, whose edge count grows with the SQUARE of
    * point density. The dense candidate-pair stream is never
    * materialized: neighbor counts, cell edges, and border labels are
    * three streaming aggregations over the (recomputed) grid join, so
    * peak memory tracks points + cells, not pairs. A point with no
    * neighbor inside eps costs one id-only join row — and at
    * minPts = 1 it is a CORE singleton, not noise (|N| counts the
    * point itself). */
  def dbscan(points: DataFrame, idCol: String, xCol: String,
      yCol: String, eps: Long, minPts: Long): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1, got $minPts")
    require(eps >= 1, s"eps must be positive, got $eps")
    // largest g with 2g^2 <= eps^2: intra-cell pairs are within eps
    val g = math.max(1L, math.floor(eps / math.sqrt(2.0)).toLong)
    val pts = Dedup.persistTracked(points.select(
      col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")))
    // recomputed per consumer — three cheap streaming passes beat one
    // materialized pair frame that is quadratic in local density
    def pairs = candidatePairs(pts, "id", "x", "y", eps, g)
    def sym = pairs.select(explode(array(
        struct(col("id_a").as("id"), col("id_b").as("nbr")),
        struct(col("id_b").as("id"), col("id_a").as("nbr")))).as("e"))
      .select(col("e.id").as("id"), col("e.nbr").as("nbr"))
    // |N_eps(p)| counts the point itself, the textbook convention.
    // LEFT join from pts, not an aggregate of sym alone: a point with
    // NO neighbor never appears in the pair stream, yet at minPts = 1
    // it is still a core singleton — the aggregate-only form silently
    // labeled it noise (caught by SpatialPropertySpec's random sweep).
    val core = pts.select(col("id"))
      .join(sym.groupBy(col("id")).agg(count(lit(1)).as("nn")),
        Seq("id"), "left")
      .filter(coalesce(col("nn"), lit(0L)) + 1L >= minPts)
      .select(col("id"))
      .transform(Dedup.persistTracked)
    // packed cell key (coordinates are bounded well below 2^30 cells)
    def cellKey(x: Column, y: Column): Column =
      (floor(x / g) + (1L << 30)) * (1L << 31) + (floor(y / g) + (1L << 30))
    val coreCells = pts
      .join(core, Seq("id"), "leftsemi")
      .select(col("id"), cellKey(col("x"), col("y")).as("cell"))
      .transform(Dedup.persistTracked)
    // cell graph: one witnessing core-core pair connects two cells;
    // distinct-aggregate BEFORE anything is stored
    val corePairs = pairs
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "leftsemi")
      .join(core.select(col("id").as("id_b")), Seq("id_b"), "leftsemi")
    val cellEdges = corePairs
      .select(cellKey(col("ax"), col("ay")).as("ca"),
        cellKey(col("bx"), col("by")).as("cb"))
      .filter(col("ca") =!= col("cb")).distinct()
    val cellComp = Dedup.clustersStar(cellEdges, "ca", "cb")
      .select(col("ca").as("cell"), col("cluster").as("comp"))
    // component label = MIN core id in the component; cells with no
    // inter-cell edge form their own component
    val labeled = coreCells.join(cellComp, Seq("cell"), "left")
      .select(col("id"), coalesce(col("comp"), col("cell")).as("comp"))
    val compMin = labeled.groupBy(col("comp"))
      .agg(min(col("id")).as("cluster"))
    val coreLabels = labeled.join(compMin, Seq("comp"))
      .select(col("id"), col("cluster"))
      .transform(Dedup.persistTracked)
    val borders = sym
      .join(core, Seq("id"), "leftanti") // only non-core probe points
      .join(coreLabels.select(col("id").as("nbr"), col("cluster")),
        Seq("nbr"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    val out = coreLabels.select(col("id"), lit("core").as("role"),
        col("cluster"))
      .unionAll(borders.select(col("id"), lit("border").as("role"),
        col("cluster")))
    // shuffle_hash on the labeled side (guide §3.1): the anti-join only
    // needs a per-partition hash of labeled ids — the planner's
    // sort-merge sorted BOTH point-sized sides (round-11 measured
    // ~0.5 s of q_spatial_dbscan); the build side is id-only (8
    // bytes/row) so a partition's hash map stays small at any scale
    val noise = pts.select(col("id"))
      .join(out.select(col("id")).hint("shuffle_hash"), Seq("id"),
        "leftanti")
      .select(col("id"), lit("noise").as("role"),
        lit(-1L).as("cluster"))
    out.unionAll(noise)
  }

  /** Per-cell point density with a hotspot flag — the skew auditor for
    * [[radiusJoin]]'s cell-size choice (a cell holding k points costs
    * O(k²) verify work in its neighborhood) and a standalone spatial
    * aggregation. One hash aggregation; returns
    * (cx, cy, n, hotspot). */
  def density(points: DataFrame, xCol: String, yCol: String,
      cell: Long, hotspotAt: Long): DataFrame = {
    require(cell > 0, s"cell must be positive, got $cell")
    points.select(
        expr(s"floor(CAST($xCol AS LONG) / ${cell}L)").as("cx"),
        expr(s"floor(CAST($yCol AS LONG) / ${cell}L)").as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).as("n"))
      .withColumn("hotspot", col("n") >= lit(hotspotAt))
  }
}
