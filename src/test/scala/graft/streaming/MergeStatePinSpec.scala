package graft.streaming

import graft.athenaeum.SparkSpec

/** The tiered-compaction SCALE claims as executable pins:
  *
  *  1. a fold's write volume is bounded by the folded runs' OWN size —
  *     proportional to the batch range it covers, never the total
  *     state (the round-9 single-level layout folded EVERYTHING into
  *     one base every `compactEvery` batches and fails this);
  *  2. cumulative compaction write over a long stream is amortized
  *     O(N log N), never O(N²);
  *  3. NO WRITE STALL: at most ONE fold runs per invocation, so the
  *     worst-case single batch pays one level's fold — the round-10
  *     layout cascaded L1+L2+L3 inside one call (batch 8 of the 30×
  *     probe paid all three back to back) and fails this;
  *  4. the backlog still drains: the unfolded level-0 run count stays
  *     bounded over the stream (one fold per batch is enough, since
  *     level fills are geometric).
  *
  * The per-fold ledger is driven from `compactIfDue`'s RETURNED folds
  * (so an intra-call cascade cannot hide intermediates from the
  * cumulative bound), cross-checked against the raw filesystem (fold
  * markers under `_markers`, partition directory sizes under
  * `data/__bt=*`) so the pin measures the LAYOUT, not the code's
  * self-reporting. */
class MergeStatePinSpec extends SparkSpec {

  private def du(f: java.io.File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum

  /** Marker names under `_markers` with a `cmp-` prefix. */
  private def foldMarkerNames(path: String): Set[String] =
    Option(new java.io.File(s"$path/_markers").listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(_.startsWith("cmp-")).toSet

  /** Bytes at rest per live partition (negative ids = folded runs). */
  private def partSizes(path: String): Map[Long, Long] =
    Option(new java.io.File(s"$path/data").listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith("__bt="))
      .map(d => d.getName.stripPrefix("__bt=").toLong -> du(d)).toMap

  test("per-fold write bounded by inputs' own size; cumulative write O(N log N); at most one fold per invocation (no cascade stall); backlog drains; two levels trigger") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft-mspin").toString + "/freq"
    val n = 24
    val fanout = 2
    val rowsPerBatch = 3000
    // fully distinct keys per batch: state grows linearly, merged fold
    // content ~= sum of its inputs (the honest worst case for folding)
    def delta(b: Int) = (0 until rowsPerBatch)
      .map(i => (b * 1000000L + i, 1L)).toDF("h", "ndocs")
    // fold-event ledger from compactIfDue's RETURNS: (fold, bytes).
    // Bytes sampled immediately after the call — a returned fold's
    // partition always survives to its own invocation's end (it can be
    // consumed only by a LATER call), so the sample is its write volume
    var ledger = Vector.empty[(BucketedState.Fold, Long)]
    var perInvocation = Vector.empty[Int]
    var level0Sizes = Vector.empty[Long]
    var maxUnfolded = 0
    (0 until n).foreach { b =>
      val folds = MergeState.compactIfDue(spark, path, b.toLong,
        Seq("h"), Seq("ndocs"), compactEvery = fanout)
      perInvocation :+= folds.size
      val sizes = partSizes(path)
      val names = foldMarkerNames(path)
      folds.foreach { f =>
        // filesystem cross-check: the returned fold is committed
        // (marker present) and its partition is on disk
        assert(names.contains(s"cmp-${f.level}-${f.start}-${f.hi}"),
          s"returned fold $f has no committed marker")
        assert(sizes.contains(f.id),
          s"returned fold $f has no partition __bt=${f.id}")
        ledger :+= ((f, sizes(f.id)))
      }
      // backlog: unfolded level-0 runs = committed batches above the
      // live folds' max hi (markers are the source of truth)
      val foldedHi = BucketedState.foldMarkers(spark, path)
        .map(_.hi).foldLeft(-1L)(math.max)
      val unfolded = BucketedState.committedBatches(spark, path)
        .count(_ > foldedHi)
      maxUnfolded = math.max(maxUnfolded, unfolded)
      MergeState.appendDelta(delta(b), path, b.toLong, "h", 4)
      partSizes(path).get(b.toLong).foreach(level0Sizes :+= _)
    }
    val perBatch = level0Sizes.sorted.apply(level0Sizes.size / 2)
    assert(perBatch > 8 * 1024,
      s"fixture too small to be probative: $perBatch B/batch")
    assert(ledger.nonEmpty, "no fold ever committed")
    def cover(f: BucketedState.Fold): Long = f.hi - f.start + 1
    // (1) two levels triggered: some fold covers > fanout batches (a
    // fold of folds), and some covers exactly fanout
    assert(ledger.exists { case (f, _) => cover(f) > fanout },
      s"no second-level fold in ${ledger.map(_._1)}")
    assert(ledger.exists { case (f, _) => cover(f) <= fanout },
      "every fold covered more than one level-0 tier — single-level " +
        s"fold-everything layout: ${ledger.map(_._1)}")
    // (2) EVERY fold's write is bounded by its inputs' own size: the
    // covered batches' delta bytes (keys are distinct, so merged ==
    // sum) plus 60% slack for parquet framing. A fold that reads total
    // state into itself violates this late in the stream.
    ledger.foreach { case (f, bytes) =>
      val cap = cover(f) * perBatch * 8 / 5
      assert(bytes <= cap,
        s"fold $f wrote $bytes B > cap $cap B (${cover(f)} batches x " +
          s"$perBatch B) — fold write is not bounded by the folded " +
          "runs' own size")
    }
    // (3) LATE SMALL FOLDS must exist: in the stream's last quarter
    // there is a fold covering <= fanout batches (the tiered
    // signature). Single-level layouts only ever fold [0, T].
    assert(ledger.exists { case (f, _) =>
      f.start >= n * 3 / 4 && cover(f) <= fanout },
      "no small fold late in the stream — compaction re-reads the " +
        s"whole prefix every time: ${ledger.map(_._1)}")
    // (4) cumulative compaction write is amortized O(N log N): every
    // record is rewritten ~once per level (~log2(N/fanout) + 1 levels
    // here), never O(N^2 / compactEvery). The ledger now counts every
    // committed fold (returned, not filesystem-sampled), so an
    // intra-call cascade's intermediates cannot escape the sum. 6x
    // headroom on the tiered expectation (~3.7 N·perBatch at N=24)
    // still rejects the single-level layout (~12.5 N·perBatch).
    val totalFold = ledger.map(_._2).sum
    val bound = 6L * n * perBatch
    assert(totalFold <= bound,
      s"cumulative compaction write $totalFold B > $bound B — " +
        "amortized per-batch compaction cost grows with the corpus")
    // (5) NO CASCADE STALL: at most one fold per invocation, so the
    // worst single batch pays max-single-fold, never a multi-level
    // cascade's sum. Round 10's layout returns [L1,L2,L3] from one
    // call here and fails. Combined with (2), per-BATCH compaction
    // write is bounded by one level's own fold size.
    assert(perInvocation.forall(_ <= 1),
      s"an invocation committed a cascade of folds: $perInvocation — " +
        "the worst-case batch pays a multi-level write stall")
    // (6) the one-fold budget still DRAINS the backlog: unfolded
    // level-0 runs stay bounded by fanout + the level count (+1 for
    // the in-flight batch), never grow with the stream
    val levels = ledger.map(_._1.level).max
    assert(maxUnfolded <= fanout + levels + 1,
      s"level-0 backlog grew to $maxUnfolded unfolded runs " +
        s"(fanout $fanout, $levels levels) — one fold per batch is " +
        "not draining it")
    // (7) correctness after all that folding: the merged state equals
    // the full recompute over every delta
    val got = MergeState.readMerged(spark, path, n.toLong - 1,
      Seq("h"), Seq("ndocs")).get
    assert(got.count() == n.toLong * rowsPerBatch)
    import org.apache.spark.sql.functions._
    assert(got.agg(sum("ndocs")).head.getLong(0) ==
      n.toLong * rowsPerBatch)
  }
}
