package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed replacements for GLOBAL (unpartitioned) window
  * functions — the one plan shape Spark cannot parallelize on its own
  * (`WindowExec: No Partition Defined … moving all data to a single
  * partition`). A global rank / running sum / running max over a total
  * order is computed here as:
  *
  *   1. `repartitionByRange(parts, sortCols)` — partition i holds strictly
  *      smaller keys than partition i+1 (sampled boundaries; the frame is
  *      persisted so every consumer sees ONE boundary draw),
  *   2. a per-partition window PARTITIONED BY the physical partition id —
  *      fully parallel, never a single-task sort,
  *   3. an exclusive prefix fold over the ≤`parts` per-partition totals,
  *      computed with one `collect_list` + `aggregate` higher-order
  *      function on a single row — no window at all, no join fan-out, and
  *      (unlike a 32-row `Window.orderBy(pid)`) no unpartitioned-window
  *      WARN in the logs,
  *   4. a broadcast equi-join of the offsets back onto the partitions.
  *
  * Because the sort columns form a TOTAL order (callers tie-break), the
  * result is independent of where the sampled range boundaries land.
  * Cost at 100 TB: one range shuffle + one pid hash shuffle of the data,
  * plus a `parts`-row fold — vs. the single-task global sort it replaces.
  */
object ParallelRank {

  /** One running aggregate to compute over the global order.
    * `value` must be BIGINT-typed (the prefix fold is exact-integer).
    * `op` is "sum" or "max"; `inclusive` selects the frame
    * (unboundedPreceding..currentRow vs ..-1 i.e. strictly earlier). */
  final case class RunCol(out: String, value: Column, op: String,
      inclusive: Boolean) {
    require(op == "sum" || op == "max", s"unsupported op $op")
  }

  /** One GLOBAL running aggregate for [[rankFamily]]'s `rangeAggs`:
    * `op` in sum/min/max/count over `value`, SQL default frame (RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW — peers included). Pass
    * `lit(1)` as value for count(*) semantics. Value types flow
    * through typed (decimal sums stay decimal); callers must keep fp
    * sums out (reassociation changes float/double rounding). */
  final case class RangeAgg(out: String, value: Column, op: String) {
    require(Set("sum", "min", "max", "count")(op), s"unsupported op $op")
  }

  /** One fold column for [[foldOffsets]]: `op` in sum/min/max, `ddl` the
    * accumulator's SQL type, `zeroInit` selects a typed-0 start (counts:
    * never NULL) vs a NULL start with SQL null-skip semantics (value
    * sums: the prefix is NULL until the first non-null total, exactly an
    * all-NULL window frame). */
  private final case class FoldSpec(op: String, ddl: String,
      zeroInit: Boolean)

  /** Exclusive prefix fold over the per-partition totals: collapse the
    * (pid, totals…) rows into ONE sorted array and fold left with the
    * `aggregate` HOF, emitting each pid's prefix BEFORE combining its own
    * total. zeroInit sums start at a typed 0 and add unconditionally
    * (count totals are never NULL); NULL-init sums skip NULL totals the
    * way SQL SUM skips NULL values; min/max start at NULL and combine
    * with `least`/`greatest`, which skip NULLs. Sum combines re-CAST to
    * the accumulator type (decimal addition widens precision by one and
    * the HOF's accumulator type is fixed). The finish lambda also stamps
    * every row with the GRAND total `__g<i>` (the fold's final
    * accumulator) — a free global count/sum saving consumers a second
    * pass over the data (ntile uses it as n). */
  private def foldOffsets(totals: DataFrame,
      specs: Seq[FoldSpec]): DataFrame = {
    val n = specs.size
    val outDdl = specs.zipWithIndex
      .map { case (s, i) => s"__o$i: ${s.ddl}" }.mkString(", ")
    val zeros = specs.zipWithIndex.map { case (s, i) =>
      val z = if (s.op == "sum" && s.zeroInit) s"CAST(0 AS ${s.ddl})"
        else s"CAST(NULL AS ${s.ddl})"
      s"'__r$i', $z"
    }.mkString(", ")
    val emits = (0 until n).map(i => s"'__o$i', acc.__r$i").mkString(", ")
    val finals = (0 until n).map(i =>
      s"'__o$i', s.__o$i, '__g$i', acc.__r$i").mkString(", ")
    val combines = specs.zipWithIndex.map { case (s, i) =>
      val c = s.op match {
        case "sum" if s.zeroInit =>
          s"CAST(acc.__r$i + x.__t$i AS ${s.ddl})"
        case "sum" =>
          s"CASE WHEN x.__t$i IS NULL THEN acc.__r$i ELSE " +
            s"CAST(coalesce(acc.__r$i, CAST(0 AS ${s.ddl})) + x.__t$i " +
            s"AS ${s.ddl}) END"
        case "max" => s"greatest(acc.__r$i, x.__t$i)"
        case "min" => s"least(acc.__r$i, x.__t$i)"
      }
      s"'__r$i', $c"
    }.mkString(", ")
    totals
      .agg(sort_array(collect_list(struct(
        col("__pid") +: (0 until n).map(i => col(s"__t$i")): _*))).as("pc"))
      .selectExpr(
        s"""inline(aggregate(pc,
           |  named_struct(
           |    'arr', CAST(array() AS ARRAY<STRUCT<__pid: INT, $outDdl>>),
           |    $zeros),
           |  (acc, x) -> named_struct(
           |    'arr', array_append(acc.arr,
           |             named_struct('__pid', x.__pid, $emits)),
           |    $combines),
           |  acc -> transform(acc.arr,
           |    s -> named_struct('__pid', s.__pid, $finals))))""".stripMargin)
  }

  /** BIGINT convenience wrapper over [[foldOffsets]] for the RunCol
    * callers (counts and exact-integer runs). */
  private def exclusiveOffsets(totals: DataFrame,
      runs: Seq[RunCol]): DataFrame =
    foldOffsets(totals,
      runs.map(r => FoldSpec(r.op, "BIGINT", zeroInit = r.op == "sum")))

  /** Core: add every requested running aggregate over the global order
    * given by `sort` (must be a total order). Output columns are BIGINT.
    * All runs share ONE range shuffle and ONE per-partition window pass. */
  def withRunningAggs(df: DataFrame, parts: Int, runs: Seq[RunCol],
      sort: Column*): DataFrame = {
    require(runs.nonEmpty && sort.nonEmpty)
    // persist: the offsets fold and the rank join both consume this frame;
    // unpersisted, the two subtrees would re-run the range partitioner on
    // fresh samples and the offsets would misalign with the partitions
    val sorted = graft.operators.Dedup.persistTracked(
      df.repartitionByRange(parts, sort: _*)
        .withColumn("__pid", spark_partition_id()))
    val aggs = runs.zipWithIndex.map { case (r, i) =>
      (if (r.op == "sum") sum(r.value) else max(r.value)).as(s"__t$i")
    }
    val offs = exclusiveOffsets(
      sorted.groupBy(col("__pid")).agg(aggs.head, aggs.tail: _*), runs)
    val base = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    val withPart = runs.zipWithIndex.foldLeft(sorted) { case (d, (r, i)) =>
      val frame =
        if (r.inclusive)
          base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        else base.rowsBetween(Window.unboundedPreceding, -1)
      val f = if (r.op == "sum") sum(r.value) else max(r.value)
      d.withColumn(s"__p$i", f.over(frame))
    }
    val joined = withPart.join(broadcast(offs), Seq("__pid"))
    val out = runs.zipWithIndex.foldLeft(joined) { case (d, (r, i)) =>
      val c =
        if (r.op == "sum")
          coalesce(col(s"__o$i"), lit(0L)) + coalesce(col(s"__p$i"), lit(0L))
        else greatest(col(s"__o$i"), col(s"__p$i"))
      d.withColumn(r.out, c)
    }
    out.drop("__pid" +:
      runs.indices.flatMap(i => Seq(s"__p$i", s"__o$i", s"__g$i")): _*)
  }

  /** Shared core of [[rowNumber]]/[[ntile]]: the input plus `__gr` (the
    * 1-based global rank over `sort`) and `__n` (the total row count,
    * read off the prefix fold's final accumulator — no second pass). */
  private def globalRank(df: DataFrame, parts: Int,
      sort: Column*): DataFrame = {
    val sorted = graft.operators.Dedup.persistTracked(
      df.repartitionByRange(parts, sort: _*)
        .sortWithinPartitions(sort: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__mono", monotonically_increasing_id()))
    // the mono-id position is exact only while every partition holds
    // < 2^33 rows (the id is pid·2^33 + offset; past that the counter
    // bleeds into the partition bits and ranks silently wrap). The
    // per-partition counts are already in hand here, so enforce the
    // envelope as a FAIL-FAST on the totals path — the check rides the
    // value expression itself, so the optimizer cannot prune it.
    val totals = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__t0"))
      .withColumn("__t0", expr(
        s"IF(__t0 < ${1L << 33}L, __t0, CAST(raise_error(" +
          "'ParallelRank: a range partition exceeds 2^33 rows — " +
          "raise the parts argument') AS BIGINT))"))
    val offs = exclusiveOffsets(totals,
      Seq(RunCol("__gr", lit(1L), "sum", inclusive = true)))
    sorted.join(broadcast(offs), Seq("__pid"))
      .withColumn("__gr",
        col("__o0") + col("__mono").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .withColumnRenamed("__g0", "__n")
      .drop("__pid", "__mono", "__o0")
  }

  /** Global `row_number()` (1-based BIGINT) over a total order — the
    * drop-in for `row_number().over(Window.orderBy(…))`.
    *
    * Cheaper than the general running-agg path: after the range shuffle
    * the frame is sorted WITHIN each partition and the in-partition
    * position is read off `monotonically_increasing_id`'s low 33 bits
    * (the id is partitionId·2³³ + row offset in partition order) — no
    * second pid-hash shuffle, no window sort, ONE exchange total. The
    * persist pins the nondeterministic ids so the offsets fold and the
    * rank join see the same draw. */
  def rowNumber(df: DataFrame, out: String, parts: Int,
      sort: Column*): DataFrame =
    globalRank(df, parts, sort: _*)
      .withColumnRenamed("__gr", out)
      .drop("__n")

  /** Global inclusive running sum of a BIGINT column over a total order. */
  def runningSum(df: DataFrame, out: String, value: Column, parts: Int,
      sort: Column*): DataFrame =
    withRunningAggs(df, parts, Seq(RunCol(out, value, "sum",
      inclusive = true)), sort: _*)

  /** Global EXCLUSIVE running max (max over strictly earlier rows; NULL
    * for the first row) — the skyline/frontier building block. */
  def runningMaxExclusive(df: DataFrame, out: String, value: Column,
      parts: Int, sort: Column*): DataFrame =
    withRunningAggs(df, parts, Seq(RunCol(out, value, "max",
      inclusive = false)), sort: _*)

  /** Global NTILE(k) with exact SQL semantics (the first n mod k buckets
    * get one extra row), from the two-phase global rank; the total count
    * rides the prefix fold's grand-total column, so no second pass and
    * no scalar cross join. The ELSE branch divides by `n DIV k`, which
    * is 0 only when n < k — and then every rank satisfies the THEN
    * guard, so the division never evaluates on a taken branch. */
  def ntile(df: DataFrame, out: String, k: Int, parts: Int,
      sort: Column*): DataFrame =
    globalRank(df, parts, sort: _*)
      .withColumn(out, expr(
        s"""CAST(CASE
           |  WHEN __gr <= (__n DIV $k + 1L) * (__n % $k)
           |    THEN (__gr - 1L) DIV (__n DIV $k + 1L) + 1L
           |  ELSE __n % $k +
           |    (__gr - 1L - (__n DIV $k + 1L) * (__n % $k)) DIV (__n DIV $k)
           |    + 1L
           |END AS BIGINT)""".stripMargin))
      .drop("__gr", "__n")

  /** Every rank-family output in one STATELESS two-phase pass: optional
    * global row_number / rank / dense_rank (all 1-based BIGINT) plus the
    * total row count, over the global order given by `sort`.
    *
    * Unlike the persist-backed helpers above, this path never caches and
    * never samples at EXECUTION time, so every subtree that consumes the
    * frame can be independently recomputed and still agree — the
    * property [[GlobalWindowRule]] needs, because a plan spliced by an
    * optimizer rule is re-optimized, pruned, and duplicated by later
    * batches, and a persist()-registered fragment does not survive that
    * (a pruned copy no longer matches its cache entry). The recipe:
    *
    *   1. BUILD TIME (two driver jobs, run while this method executes):
    *      count the rows, then hash-sample ~64 keys per bucket
    *      (`xxhash64(key) % m == 0` — a pure per-row predicate, so the
    *      sample is identical on every recompute), sort the sample, and
    *      read bucket CUTPOINTS off it. The cutpoints become LITERALS in
    *      the plan: partitioning is now a pure function of the row.
    *   2. Assign each row its bucket with a codegen'd binary-search CASE
    *      tree over the cutpoints (O(log buckets) comparisons per row;
    *      an array-HOF count would be interpreted and O(buckets)).
    *   3. Per-bucket counts (+ distinct-key counts for dense_rank) via a
    *      map-side-combined aggregation — a tiny (≤4·parts row) frame —
    *      folded into exclusive prefix offsets and broadcast back.
    *   4. In-bucket row_number/rank/dense_rank with a window PARTITIONED
    *      BY the bucket id (parallel; its hash exchange is the only
    *      full-data shuffle), plus the broadcast offset.
    *
    * Ties: equal full sort keys are equal on the first sort column, and
    * the bucket is a function of the first sort column only — so a tie
    * group never spans buckets and in-bucket tie structure IS global tie
    * structure (rank/dense_rank exact). Nulls in the first key follow
    * its null ordering (bucket 1 for nulls-first, last bucket for
    * nulls-last). Heavy ties on the first key flood one bucket — the
    * same skew a range partitioner has, fail-fast at 2^31 rows/bucket
    * (in-bucket row_number is 32-bit).
    *
    * REQUIRES a deterministic input: the offsets pass and the rank pass
    * recompute `df` independently (callers like [[GlobalWindowRule]]
    * guard this). `sampleFrom`, when given, must be a cardinality- and
    * key-multiset-preserving view of `df` (e.g. the plan under a stack
    * of window operators): the count/sample jobs AND the per-bucket
    * offsets aggregation run against it instead — same counts, same tie
    * structure, but neither build-time jobs nor the offsets branch ever
    * execute operators `df` merely wraps.
    *
    * `rangeAggs` adds GLOBAL running aggregates over the same order with
    * the SQL default frame (RANGE UNBOUNDED PRECEDING..CURRENT ROW —
    * peers included, so the result is tie-order-independent): per-bucket
    * totals ride the same tiny offsets aggregation, the prefix fold runs
    * typed (decimal sums stay decimal), and the in-bucket pass is a
    * RANGE-frame window on the same bucket partitioning. Exactness note:
    * callers must not request fp sums here — per-bucket reassociation
    * changes float/double rounding ([[GlobalWindowRule]] filters those);
    * integral/decimal sums, min/max, count are associative-exact. */
  def rankFamily(df: DataFrame, parts: Int, sort: Seq[Column],
      rowNumOut: Option[String] = None, rankOut: Option[String] = None,
      denseOut: Option[String] = None, totalOut: Option[String] = None,
      sampleFrom: Option[DataFrame] = None,
      rangeAggs: Seq[RangeAgg] = Nil): DataFrame = {
    require(sort.nonEmpty, "rankFamily needs a sort order")
    require((rowNumOut ++ rankOut ++ denseOut ++ totalOut).nonEmpty ||
      rangeAggs.nonEmpty, "rankFamily: no outputs requested")
    val (keyCol, asc, nullsFirst) =
      org.apache.spark.sql.GraftSqlBridge.sortSpec(sort.head)
    val buckets = math.max(parts, 1) * 4 // 4× smooths bucket→reducer hash collisions
    val src = sampleFrom.getOrElse(df)
    val n = src.count()
    val target = buckets.toLong * 64
    val m = math.max(1L, n / target)
    val dirKey = if (asc) col("__gwk").asc else col("__gwk").desc
    // limit() is a top-k safety cap for the driver; it binds only when
    // the binomial sample lands >4× its mean (practically never), and a
    // mildly biased cutpoint set only costs balance, not correctness
    val sampled0 = src.select(keyCol.as("__gwk"))
      .filter(col("__gwk").isNotNull &&
        pmod(xxhash64(col("__gwk")), lit(m)) === lit(0L))
      .orderBy(dirKey)
      .limit((target * 4).toInt)
      .collect().map(_.get(0))
    // LOW-CARDINALITY fallback: with few distinct keys (an ORDER BY on a
    // 5-value priority column), every distinct value can dodge the 1/m
    // hash and leave the sample EMPTY — which would collapse every row
    // into bucket 1: a single-partition pass, and (because lit(1) is
    // foldable) a plan whose __pid partition the optimizer erases,
    // resurrecting the unpartitioned window this whole path exists to
    // kill (caught at sf0.1 by q_sql_global_rank — sf0.01's m = 1 never
    // exposed it). The fallback samples DISTINCT keys instead: it only
    // triggers when the distinct count is ≲ m (else some key passes the
    // hash), so the distinct aggregate is map-side-combined tiny at any
    // corpus size. Duplicate cutpoints from a short list just leave
    // empty buckets — correctness never depended on balance.
    val sampled =
      if (sampled0.nonEmpty || m == 1L) sampled0
      else src.select(keyCol.as("__gwk")).filter(col("__gwk").isNotNull)
        .distinct().orderBy(dirKey)
        .limit((target * 4).toInt)
        .collect().map(_.get(0))
    val dt = src.select(keyCol.as("__gwk")).schema.head.dataType
    val cuts: IndexedSeq[Column] =
      if (sampled.isEmpty) IndexedSeq.empty
      else (1 until buckets).map { i =>
        org.apache.spark.sql.GraftSqlBridge.column(
          org.apache.spark.sql.catalyst.expressions.Literal.create(
            sampled((i.toLong * sampled.length / buckets).toInt), dt))
      }
    def passed(cut: Column): Column =
      if (asc) keyCol > cut else keyCol < cut
    // bucket = 1 + number of cutpoints the key has passed in sort order,
    // found by binary search (passed() is monotone over the sorted cuts;
    // duplicate cutpoints just leave empty buckets). A null key yields
    // null predicates, falls through every otherwise() to bucket 1 —
    // exactly nulls-first; nulls-last is pinned explicitly.
    def tree(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo + 1)
      else {
        val mid = (lo + hi) / 2
        when(passed(cuts(mid)), tree(mid + 1, hi)).otherwise(tree(lo, mid))
      }
    val bucket =
      if (cuts.isEmpty) lit(1)
      else if (nullsFirst) tree(0, cuts.length)
      else when(keyCol.isNull, lit(buckets)).otherwise(tree(0, cuts.length))
    val withB = df.withColumn("__pid", bucket)
    // dense_rank offsets need per-bucket DISTINCT sort-KEY counts:
    // unwrap sort columns to their bare value expressions for the struct
    val keyCols = sort.map(org.apache.spark.sql.GraftSqlBridge.sortChild)
    val needDense = denseOut.nonEmpty
    val aggBase = if (needDense) 2 else 1
    val aggs = Seq(count(lit(1)).as("__t0")) ++
      (if (needDense)
        Seq(countDistinct(struct(keyCols: _*)).as("__t1")) else Nil) ++
      rangeAggs.zipWithIndex.map { case (ra, j) =>
        (ra.op match {
          case "sum"   => sum(ra.value)
          case "min"   => min(ra.value)
          case "max"   => max(ra.value)
          case "count" => count(ra.value)
        }).as(s"__t${aggBase + j}")
      }
    val totals = src.withColumn("__pid", bucket).groupBy(col("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__t0", expr(
        s"IF(__t0 < ${1L << 31}L, __t0, CAST(raise_error(" +
          "'ParallelRank.rankFamily: a bucket exceeds 2^31 rows — " +
          "first sort key too skewed') AS BIGINT))"))
    // the fold accumulator types come off the AGGREGATED schema (sum of
    // int is BIGINT, sum of decimal(p,s) is decimal(p+10,s), …)
    val specs =
      Seq(FoldSpec("sum", "BIGINT", zeroInit = true)) ++
      (if (needDense)
        Seq(FoldSpec("sum", "BIGINT", zeroInit = true)) else Nil) ++
      rangeAggs.zipWithIndex.map { case (ra, j) =>
        val ddl = totals.schema(s"__t${aggBase + j}").dataType.sql
        ra.op match {
          case "count" => FoldSpec("sum", "BIGINT", zeroInit = true)
          case "sum"   => FoldSpec("sum", ddl, zeroInit = false)
          case op      => FoldSpec(op, ddl, zeroInit = false)
        }
      }
    val offs = foldOffsets(totals, specs)
    val wbase = Window.partitionBy(col("__pid")).orderBy(sort: _*)
    // SQL's default running frame: peers (equal full sort keys) included
    val wrange =
      wbase.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    var out = withB.join(broadcast(offs), Seq("__pid"))
    rowNumOut.foreach { o => out = out.withColumn(o,
      col("__o0") + row_number().over(wbase).cast("long")) }
    rankOut.foreach { o => out = out.withColumn(o,
      col("__o0") + rank().over(wbase).cast("long")) }
    denseOut.foreach { o => out = out.withColumn(o,
      col("__o1") + dense_rank().over(wbase).cast("long")) }
    totalOut.foreach { o => out = out.withColumn(o, col("__g0")) }
    rangeAggs.zipWithIndex.foreach { case (ra, j) =>
      val i = aggBase + j
      val o = col(s"__o$i")
      val dt = totals.schema(s"__t$i").dataType
      val c = ra.op match {
        case "count" => o + count(ra.value).over(wrange)
        case "sum" =>
          // SQL SUM is NULL over an all-NULL frame, else skips NULLs
          val p = sum(ra.value).over(wrange)
          val zero = lit(0).cast(dt)
          when(o.isNull && p.isNull, lit(null).cast(dt))
            .otherwise(coalesce(o, zero) + coalesce(p, zero)).cast(dt)
        case "min" => least(o, min(ra.value).over(wrange))
        case "max" => greatest(o, max(ra.value).over(wrange))
      }
      out = out.withColumn(ra.out, c)
    }
    val helpers = Seq("__pid") ++
      specs.indices.flatMap(i => Seq(s"__o$i", s"__g$i"))
    out.drop(helpers: _*)
  }

  /** Exact global top-k WITH dense 1..k ranks and no unpartitioned
    * window: `orderBy(…).limit(k)` plans as TakeOrderedAndProject
    * (parallel per-partition partial top-k, merged k-row result — a
    * SINGLE partition by construction, `coalesce(1)` pins that against
    * planner drift), then the ≤k-row frame is ranked by a window
    * PARTITIONED on the physical partition id: one partition holds all
    * k rows, so the per-partition rank IS the global rank, the
    * partition spec is non-empty (no single-partition-window WARN), and
    * no extra shuffle or sampling job is spent on a k-row frame. */
  def rankedTopK(df: DataFrame, out: String, k: Int,
      sort: Column*): DataFrame =
    df.orderBy(sort: _*).limit(k).coalesce(1)
      .withColumn("__pid", spark_partition_id())
      .withColumn(out, row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sort: _*)).cast("long"))
      .drop("__pid")
}
