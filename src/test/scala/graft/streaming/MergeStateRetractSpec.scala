package graft.streaming

import org.apache.spark.sql.functions._

import graft.athenaeum.SparkSpec

/** Retraction (the CRDT forget) and the retention horizon on
  * [[MergeState]] — the production capabilities a takedown /
  * right-to-be-forgotten event and an unbounded stream each need.
  *
  * Retraction: [[MergeState.retractDelta]] appends NEGATED rows; the
  * merged readout then serves the forgotten keys as absence (the
  * all-zero filter), exactly-once per forget id, crash-window safe
  * (an unmarked retraction partition is invisible and swept), and
  * accumulated retraction runs fold among themselves.
  *
  * Retention: `compactIfDue(retainBatches = Some(h))` drops folds
  * entirely older than the horizon, so state bytes and partition
  * count PLATEAU on a long stream while the readout equals the
  * recompute over exactly the retained batches. */
class MergeStateRetractSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def merged(path: String, b: Long): DataFrame =
    MergeState.readMerged(spark, path, b, Seq("k"), Seq("n")).get

  test("retraction: negated delta serves forgotten keys as absence; exactly-once per forget id; later arrivals of the key count fresh") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-msrt").toString + "/state"
    def delta(b: Int) = Seq(("A", 10L + b), ("B", 5L), ("C", 1L))
      .toDF("k", "n")
    (0 until 4).foreach { b =>
      MergeState.compactIfDue(spark, path, b.toLong, Seq("k"), Seq("n"),
        compactEvery = 2)
      MergeState.appendDelta(delta(b), path, b.toLong, "k", 4)
    }
    val before = merged(path, 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before == Map("A" -> 46L, "B" -> 20L, "C" -> 4L))
    // forget key A: negate its full merged history
    val neg = merged(path, Long.MaxValue).filter(col("k") === "A")
      .select(col("k"), (-col("n")).as("n"))
    MergeState.retractDelta(neg, path, 0L)
    val after = merged(path, 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == Map("B" -> 20L, "C" -> 4L),
      s"forgotten key still served: $after")
    // retraction is exact at every pin at or above the forget-time
    // frontier (the only pins a stream ever reads after a
    // quiet-boundary forget — replays below the frontier cannot happen
    // because every appended batch was output-committed)
    assert(!merged(path, 10L).collect().exists(_.getString(0) == "A"))
    // exactly-once: a replayed forget with the same id is a no-op —
    // B/C untouched, A still absent (a double-apply would drive A to
    // -46 and the zero filter would SERVE the negative row)
    MergeState.retractDelta(neg, path, 0L)
    assert(merged(path, 3L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("B" -> 20L, "C" -> 4L))
    // a later arrival of A counts fresh on top of the zeroed history
    MergeState.appendDelta(Seq(("A", 7L)).toDF("k", "n"), path, 4L,
      "k", 4)
    assert(merged(path, 4L).filter(col("k") === "A")
      .head.getLong(1) == 7L)
  }

  test("retraction crash window: an unmarked retraction partition is invisible, swept by compaction, and the retried forget completes") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-msrtc").toString + "/state"
    (0 until 3).foreach { b =>
      MergeState.appendDelta(
        Seq(("X", 2L), ("Y", 3L)).toDF("k", "n"), path, b.toLong, "k", 4)
    }
    // crashed attempt: the negation's partition landed, the marker did
    // not (simulated by writing the partition directly)
    val rt0 = BucketedState.Rt(0, 0, 0)
    BucketedState.writeBt(
      Seq(("X", -6L)).toDF("k", "n"), path, rt0.id)
    // invisible: readers derive the readable set from markers
    assert(merged(path, 2L).filter(col("k") === "X").head.getLong(1) == 6L)
    // the next compaction pass sweeps the debris
    MergeState.compactIfDue(spark, path, 3L, Seq("k"), Seq("n"),
      compactEvery = 8)
    assert(!new java.io.File(s"$path/data/__bt=${rt0.id}").exists(),
      "unmarked retraction debris not swept")
    // the retry recomputes the negation from committed state and lands
    val neg = merged(path, Long.MaxValue).filter(col("k") === "X")
      .select(col("k"), (-col("n")).as("n"))
    MergeState.retractDelta(neg, path, 0L)
    assert(merged(path, 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("Y" -> 9L))
  }

  test("accumulated retraction runs fold among themselves (bounded live-run count), readout unchanged") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-msrtf").toString + "/state"
    val keys = (0 until 6).map(i => s"k$i")
    MergeState.appendDelta(
      keys.map(k => (k, 10L)).toDF("k", "n"), path, 0L, "k", 4)
    // forget four keys as four separate takedown events
    keys.take(4).zipWithIndex.foreach { case (k, i) =>
      val neg = merged(path, Long.MaxValue).filter(col("k") === k)
        .select(col("k"), (-col("n")).as("n"))
      MergeState.retractDelta(neg, path, i.toLong)
    }
    assert(BucketedState.rtMarkers(spark, path).size == 4)
    // no level fold is due (one delta), so compaction folds the oldest
    // retraction runs among themselves
    MergeState.compactIfDue(spark, path, 1L, Seq("k"), Seq("n"),
      compactEvery = 2)
    val rts = BucketedState.rtMarkers(spark, path)
    assert(rts.exists(_.level > 0),
      s"no retraction self-fold happened: $rts")
    // covered level-0 retractions retire after the next pass's cleanup
    MergeState.compactIfDue(spark, path, 1L, Seq("k"), Seq("n"),
      compactEvery = 2)
    val live = BucketedState.rtMarkers(spark, path)
    assert(live.size < 4, s"retraction runs not draining: $live")
    // readout unchanged through all the folding
    assert(merged(path, 0L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("k4" -> 10L, "k5" -> 10L))
    // a replayed forget covered by a folded retraction is still a no-op
    MergeState.retractDelta(
      Seq(("k0", -10L)).toDF("k", "n"), path, 0L)
    assert(!merged(path, 0L).collect().exists(_.getString(0) == "k0"))
  }

  test("retention horizon: state bytes and live runs plateau on a long stream; readout equals the recompute over exactly the retained batches") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-msret").toString + "/state"
    val n = 40
    val retain = 8L
    // distinct keys per batch — the stream-age-growing worst case the
    // horizon exists for
    def delta(b: Int) = (0 until 500)
      .map(i => (b * 10000L + i, 1L)).toDF("k", "n")
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
    def stateBytes = du(new java.io.File(s"$path/data"))
    def liveParts = Option(new java.io.File(s"$path/data").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("__bt="))
    var sizeAtHalf = 0L; var partsAtHalf = 0
    (0 until n).foreach { b =>
      MergeState.compactIfDue(spark, path, b.toLong, Seq("k"), Seq("n"),
        compactEvery = 2, retainBatches = Some(retain))
      MergeState.appendDelta(delta(b), path, b.toLong, "k", 4)
      if (b == n / 2 - 1) { sizeAtHalf = stateBytes; partsAtHalf = liveParts }
    }
    // plateau: the second half of the stream must not grow the state
    // materially (without retention it doubles)
    assert(stateBytes <= sizeAtHalf * 3 / 2,
      s"state bytes grew ${sizeAtHalf} -> ${stateBytes} over the " +
        "second half — the horizon is not bounding state size")
    assert(liveParts <= partsAtHalf + 4,
      s"live partitions grew $partsAtHalf -> $liveParts")
    // readout == recompute over exactly the retained batches (the
    // readable set: live fold ranges + unfolded deltas)
    val lastBatch = n.toLong - 1
    val folds = BucketedState.foldMarkers(spark, path)
    val foldedHi = folds.map(_.hi).foldLeft(-1L)(math.max)
    val retained = (folds.flatMap(f => f.start to f.hi) ++
      BucketedState.committedBatches(spark, path)
        .filter(b => b > foldedHi && b <= lastBatch)).distinct.sorted
    // the horizon actually dropped something, and kept at least the
    // window (retention quantizes at fold granularity: supersets only)
    assert(retained.head > 0, "nothing was ever dropped")
    assert(retained.max == lastBatch)
    assert((lastBatch - retain + 1 to lastBatch).forall(retained.contains),
      s"retained $retained misses part of the horizon window")
    val got = merged(path, lastBatch).count()
    assert(got == retained.size * 500L,
      s"readout $got rows != ${retained.size * 500L} " +
        s"(retained batches: $retained)")
  }
}
