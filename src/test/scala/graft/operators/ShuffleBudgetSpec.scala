package graft.operators

import graft.athenaeum.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** SCALE.md's "what shuffles" claims as EXECUTABLE assertions: run the
  * operator, then read the exchange write metrics out of the executed
  * plan. AQE is disabled inside this suite so exchanges appear as plain
  * `ShuffleExchangeExec` nodes (the claims are about logical shuffle
  * volume, which AQE does not change — it only re-plans around it). */
class ShuffleBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withoutAqe[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Executes `df` and returns (exchange count, total shuffle bytes
    * written). Executes via collect() on df's OWN query execution —
    * df.count() would plan a NEW query and leave these metrics zero. */
  private def shuffleProfile(df: DataFrame): (Int, Long) = {
    df.collect()
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    (exchanges.length,
      exchanges.map(_.metrics("shuffleBytesWritten").value).sum)
  }

  test("JL projection: ZERO exchanges — the compression runs inside the scan stage") {
    withoutAqe {
      val (n, _) = shuffleProfile(
        SparkEntryAccess.run(spark, dir, "q_jl_projection"))
      assert(n == 0, s"expected a fully narrow plan, found $n exchanges")
    }
  }

  test("covariance components: one exchange carrying ~one buffer, not the dataset") {
    withoutAqe {
      val df = Tables(spark, dir, "embeddings")
        .agg(graft.functions.SigAgg.covComponents(64)(col("embedding")))
      val (n, bytes) = shuffleProfile(df)
      // 500 vectors × 64 floats ≈ 128 KB of input; the exchange moves
      // partial buffers of 2145 longs (~17 KB each), never vectors
      assert(n == 1, s"expected exactly one exchange, found $n")
      assert(bytes > 0, "exchange executed but wrote no metrics")
      assert(bytes < 200 * 1024,
        s"covariance shuffled $bytes bytes — buffer-sized expected")
    }
  }

  test("minhash LSH banding: shuffle carries signatures/buckets, never document text") {
    withoutAqe {
      val docs = Dedup.persistTracked(Tables(spark, dir, "documents"))
      val textBytes = docs
        .agg(sum(length(col("text")))).head.getLong(0)
      val (n, bytes) = shuffleProfile(
        Dedup.minhashCandidates(docs, "doc_id", "text"))
      assert(n >= 1 && bytes > 0)
      assert(bytes < textBytes,
        s"LSH shuffled $bytes bytes vs $textBytes bytes of text — " +
          "document payloads must not ride the exchanges")
      Dedup.releaseAll(spark)
    }
  }

  test("top-k: both forms map-side-prune the exchange; only ours also kills the sorts") {
    withoutAqe {
      // Spark 4's WindowGroupLimit already prunes rank<=k before the
      // exchange (verified here: BOTH forms shuffle group×k rows, not
      // the table), so the custom operator's remaining win is replacing
      // the full partition sorts with bounded k-heaps — assert exactly
      // that: pruned bytes on both, zero SortExec only in ours.
      val li = Tables(spark, dir, "lineitem")
      val rawBytes = 6000L * 50 // ~6k rows; any unpruned shuffle dwarfs this /10
      val topkDf = graft.plans.TopK.topKPerGroup(li, Seq("l_returnflag"),
        Seq(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber")), k = 3, rankName = "rn")
      val (_, topkBytes) = shuffleProfile(topkDf)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      val winDf = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      val (_, windowBytes) = shuffleProfile(winDf)
      assert(topkBytes > 0 && windowBytes > 0)
      assert(topkBytes < rawBytes / 10 && windowBytes < rawBytes / 10,
        s"expected both pruned: topk=$topkBytes window=$windowBytes")
      import org.apache.spark.sql.execution.SortExec
      val topkSorts = topkDf.queryExecution.executedPlan
        .collect { case s: SortExec => s }
      val winSorts = winDf.queryExecution.executedPlan
        .collect { case s: SortExec => s }
      assert(topkSorts.isEmpty,
        s"custom operator must not sort, found ${topkSorts.length}")
      assert(winSorts.nonEmpty, "window form should sort (else Spark " +
        "learned heap-based limits and the custom operator is obsolete)")
    }
  }

  test("ParallelRank.rowNumber: ONE data-sized range exchange, no window, prefix traffic is partition-count-sized") {
    withoutAqe {
      import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
      import org.apache.spark.sql.execution.window.WindowExec
      // descend into the persisted subtree: the range exchange lives
      // under the InMemoryRelation barrier
      def all[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
        p.collect {
          case s: InMemoryTableScanExec =>
            all(s.relation.cachedPlan)(pf) ++
              (if (pf.isDefinedAt(s)) Seq(pf(s)) else Nil)
          case n if pf.isDefinedAt(n) => Seq(pf(n))
        }.flatten
      val li = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
      val ranked = graft.plans.ParallelRank.rowNumber(li, "rn", 8,
        col("l_orderkey"), col("l_linenumber"))
      ranked.collect()
      val plan = ranked.queryExecution.executedPlan
      // the persisted frame is scanned from two branches (offsets fold +
      // rank join) — both reach the SAME cached exchange instance, so
      // dedup by identity before counting
      val exchanges = all(plan) { case e: ShuffleExchangeExec => e }
        .foldLeft(Vector.empty[ShuffleExchangeExec])((acc, e) =>
          if (acc.exists(_ eq e)) acc else acc :+ e)
      val (range, rest) = exchanges.partition(
        _.outputPartitioning.isInstanceOf[RangePartitioning])
      assert(range.length == 1,
        s"expected exactly one range exchange, found ${range.length}")
      // everything else (per-partition counts -> prefix fold) moves
      // partition-count-sized rows, never the data
      val restBytes = rest
        .map(_.metrics("shuffleBytesWritten").value).sum
      assert(restBytes < 10 * 1024,
        s"prefix-fold traffic was $restBytes bytes — expected ~8 rows")
      val windows = all(plan) { case w: WindowExec => w }
      assert(windows.isEmpty,
        s"mono-id rank path must not plan a window, found ${windows.length}")
      Dedup.releaseAll(spark)
    }
  }

  test("exact dedup groups on fingerprints: shuffle stays below the text volume") {
    withoutAqe {
      val docs = Tables(spark, dir, "documents")
        .withColumn("fp",
          expr(graft.functions.XFormulas.sparkStrHash("text")))
      val textBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
      val (_, bytes) = shuffleProfile(
        Dedup.exact(docs.select(col("doc_id"), col("fp")), "doc_id", "fp"))
      assert(bytes < textBytes / 2,
        s"exact dedup shuffled $bytes vs $textBytes text bytes")
    }
  }

  test("word dropout: ZERO exchanges — augmentation is a pure narrow map") {
    withoutAqe {
      val (n, _) = shuffleProfile(
        SparkEntryAccess.run(spark, dir, "q_word_dropout"))
      assert(n == 0, s"expected a fully narrow plan, found $n exchanges")
    }
  }

  test("blocklist scan: the AC pass shuffles per-pattern COUNTS, never text") {
    withoutAqe {
      val docs = Tables(spark, dir, "documents")
      val textBytes = docs.agg(sum(length(col("text")))).head.getLong(0)
      val (n, bytes) = shuffleProfile(
        SparkEntryAccess.run(spark, dir, "q_blocklist_scan"))
      assert(n == 1, s"expected one aggregation exchange, found $n")
      assert(bytes < textBytes / 4,
        s"blocklist scan shuffled $bytes vs $textBytes text bytes")
    }
  }

  test("grid DBSCAN: total job shuffle stays below the eps-graph it never materializes") {
    // shuffleProfile can't see exchanges inside persisted subtrees, so
    // this claim measures ALL jobs via a listener: run a dense cloud
    // whose eps-graph is ~37x the point count and assert the whole
    // dbscan run shuffles less than that pair frame's raw bytes —
    // executable proof that the pair stream is aggregated, never moved
    import spark.implicits._
    val pts = Dedup.persistTracked(spark.range(1L, 2001L).selectExpr(
      "id", "(id * 37) % 200 AS x", "(id * 91) % 200 AS y").toDF())
    val pairBytes = 24L * Spatial.radiusJoin(
      pts, "id", "x", "y", 30L, 30L).count() // (id,id,dist2) raw longs
    assert(pairBytes > 1000L * 1000L,
      s"fixture not dense enough to be probative: $pairBytes")
    val acc = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Spatial.dbscan(pts, "id", "x", "y", eps = 30L, minPts = 5L).collect()
      org.apache.spark.sql.GraftSqlBridge.flushListeners(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(acc.get() > 0, "listener saw no shuffle at all")
    assert(acc.get() < pairBytes / 2,
      s"dbscan shuffled ${acc.get()} bytes vs a $pairBytes-byte eps-graph")
  }

  test("sampled-anchor substring dedup shuffles a fraction of the dense operator") {
    // the SCALE.md headline as an executable claim: winnowing runs
    // inside a projection (zero exchange), so the sampled plan's total
    // job shuffle — anchors + match-sized residual + the dense re-gram
    // of the duplicated minority — must sit well under the dense
    // operator's corpus-sized gram exchange. Listener-measured (both
    // operators persist subtrees shuffleProfile cannot see into).
    val docs = Tables(spark, dir, "documents")
    def jobShuffle(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            acc.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.sql.GraftSqlBridge.flushListeners(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      Dedup.releaseAll(spark)
      acc.get()
    }
    val dense = jobShuffle(
      Dedup.duplicatedSubstrings(docs, "doc_id", "text", 30).collect())
    val sampled = jobShuffle(
      Dedup.duplicatedSubstringsSampled(docs, "doc_id", "text", 30, 8)
        .collect())
    assert(dense > 0 && sampled > 0, s"dense=$dense sampled=$sampled")
    assert(sampled * 3 < dense,
      s"sampled mode shuffled $sampled bytes vs dense $dense — " +
        "the anchor exchange should be a small fraction")
  }

  test("substring gate: per-batch shuffle tracks the INCREMENT, not accumulated state") {
    // round 7's one scale-killer, closed and pinned: the gram/doc state
    // tables are bucketed by their join keys at rest (BucketedState), so
    // batch N's state join exchanges only the increment — on a corpus
    // with NO cross-batch duplicates (unique hex text) the per-batch
    // shuffle must stay FLAT while state doubles and triples. The old
    // VersionedTable layout re-shuffled all accumulated state: batch 3
    // paid ~3x batch 2's join exchange and this assertion fails on it.
    import spark.implicits._
    def jobShuffle(body: => Unit): Long = {
      val acc = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            acc.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        org.apache.spark.sql.GraftSqlBridge.flushListeners(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      acc.get()
    }
    def mix(x: Long): Long = {
      var z = x * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def batchDf(b: Int) = (0 until 300).map { i =>
      val id = b * 1000L + i
      (id, (0 until 15).map(k => f"${mix(id * 31L + k)}%016x").mkString)
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sbudget").toString
    val snk = graft.streaming.SubstrGate.sink(s"$dir/docs",
      s"$dir/grams", s"$dir/out", "doc_id", "text", minLen = 30)
    val walls = (0 until 3).map(b => jobShuffle(snk(batchDf(b), b.toLong)))
    assert(walls.forall(_ > 0), s"per-batch shuffle: $walls")
    // batch 1 joins 1 increment of state, batch 2 joins 2: a layout
    // that re-shuffles state pays ~+1 increment of exchange at batch 2
    assert(walls(2) < walls(1) * 1.35,
      s"per-batch shuffle grew with accumulated state: $walls")
  }

  test("MaxSim: exchanges carry (doc, qtok, int) grid rows, never vectors") {
    withoutAqe {
      val emb = Tables(spark, dir, "embeddings")
      val vecBytes = emb.agg(sum(size(col("embedding")) * 4))
        .head.getLong(0)
      val (_, bytes) = shuffleProfile(
        SparkEntryAccess.run(spark, dir, "q_colbert_maxsim"))
      assert(bytes < vecBytes / 2,
        s"MaxSim shuffled $bytes vs $vecBytes vector bytes")
    }
  }
}

/** Test-local accessor: runs a SparkEntry query by name. */
private object SparkEntryAccess {
  def run(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): DataFrame =
    graft.SparkEntry.queries(name)(spark, dir)
}
