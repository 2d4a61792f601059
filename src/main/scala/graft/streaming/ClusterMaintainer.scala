package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.VersionedTable

/** STREAMING near-dup cluster maintenance — the production loop of
  * `q_ingest_clusters2` as a `foreachBatch` sink: every micro-batch of
  * documents folds into the persistent cluster-label table via
  * [[Dedup.incrementalClusters]], with BOTH pieces of state — the label
  * table and the corpus's LSH BUCKET INDEX — maintained as durable
  * tables rather than executor memory.
  *
  * Per batch: sign ONLY the batch's documents; candidate pairs =
  * batch×stored-index (cross) ∪ batch×batch (intra); contract onto
  * the stored labels and commit the updated label SNAPSHOT plus the
  * batch's index APPEND. Every committed label version is the true
  * CC of all documents seen so far ([[Dedup.incrementalClusters]]'
  * batch-equivalence argument, applied inductively per batch), so a
  * reader at any version sees a consistent, recompute-equal clustering.
  *
  * State layout at 100 TB: the index is stored ALREADY BANDED —
  * (id, band, bucket) rows in a [[BucketedState]] table bucketed by
  * `bucket` at rest — so the per-batch cross join streams the entire
  * accumulated index with no exchange and no sort: it equi-joins on
  * `bucket` ALONE (exactly the at-rest partitioning — Spark's
  * co-partition rule demands the partitioning cover ALL join keys)
  * with the band match as a non-equi residual, and only the
  * increment's banded rows shuffle. The round-7 layout stored raw
  * signatures and re-banded + re-exchanged the WHOLE index every batch
  * — band-amplified full-state shuffle, the pattern that cannot
  * survive accumulated state. Under a finite `maxBucket` the over-cap
  * bucket list is ONE exchange-free aggregation over the bucketed scan
  * (partial/final agg both land on the at-rest partitioning) and an
  * equally co-partitioned anti join — the cap costs a second state
  * SCAN, never a state exchange. Labels are one (id, rep) row per
  * PAIRED doc, committed as a snapshot; neither state lives on an
  * executor heap, and recovery is "read the last committed versions".
  *
  * Exactly-once and crash windows ride [[GateKit]]: both commits are
  * idempotent per batch id, the label commit is the completion marker
  * ([[GateKit.runOnce]]), the index appends FIRST, and the orders of a
  * replayed partial failure both converge —
  *  - labels landed, the index append did not: the replay re-commits
  *    only the index; the committed labels were computed from the
  *    batch's own in-memory candidates, so they are already correct;
  *  - the index append landed, labels did not: the replay reads the
  *    index as it stood BEFORE the batch ([[BucketedState.readBefore]]
  *    partition pruning), so it joins exactly the index the no-crash
  *    run would have — without the pin, the batch's own replayed rows
  *    would also sit in the index, and under a finite `maxBucket`
  *    those extra rows can push a (band, bucket) over the cap and DROP
  *    genuine increment-vs-base pairs (self-pairs and duplicate intra
  *    pairs are harmless for connectivity, but cap-induced drops are
  *    not), diverging the replayed labels from the no-crash result. */
object ClusterMaintainer {

  /** `ds.writeStream.foreachBatch(ClusterMaintainer.sink(...))`. */
  def sink(labelsPath: String, idxPath: String, idCol: String,
      textCol: String, maxBucket: Int = Int.MaxValue, nBuckets: Int = 32)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    GateKit.runOnce(spark, labelsPath, batchId) {
      import spark.implicits._
      val sigsNew = Dedup.persistTracked(
        Dedup.minhashSignatures(batch, idCol, textCol))
      // the cap applies WITHIN the batch too: a viral (band, bucket) in
      // one micro-batch would otherwise materialize the full quadratic
      // pair set the cap exists to prevent
      val intra = Dedup.candidatesFromSignatures(sigsNew, idCol,
          maxBucket = maxBucket)
        .select(col("doc_a"), col("doc_b"))
      // the increment's banded index rows, aligned onto the state's
      // bucket function once: the cross join and the append reuse it
      val incIdx = Dedup.persistTracked(
        Dedup.lshIndex(sigsNew, idCol)
          .select(col(idCol), col("band"), col("bucket"))
          .repartition(nBuckets, col("bucket")))
      // SERVED index: a forgotten doc's banded rows are tombstone-
      // filtered, so it can never connect future arrivals
      val cross = BucketedState.readBeforeServed(spark, idxPath, batchId) match {
        case Some(base0) =>
          // all three joins below equi-join on `bucket` ALONE — the
          // state's at-rest HashPartitioning(bucket) then covers the
          // join keys EXACTLY (requireAllClusterKeysForCoPartition) and
          // the index streams exchange-free; the band equality rides as
          // a NON-EQUI residual (`band_l − band_r = 0`), which Catalyst
          // cannot lift into the key set. Written as a (band, bucket)
          // key pair, every batch re-exchanged the whole accumulated
          // index — ShuffleBudgetSpec's cluster pin measures it.
          val base =
            if (maxBucket == Int.MaxValue) base0
            else {
              // over-cap buckets of the PINNED index: exchange-free
              // aggregation on the at-rest partitioning, then an
              // equally co-partitioned anti join (the over list is the
              // build side; the index streams)
              val over = base0
                .groupBy(col("band"), col("bucket"))
                .agg(count(lit(1)).as("__n"))
                .filter(col("__n") > maxBucket)
                .select(col("band").as("_oband"),
                  col("bucket").as("_obucket"))
              base0.join(over.hint("shuffle_hash"),
                col("bucket") === col("_obucket") &&
                  (col("band") - col("_oband")) === 0,
                "left_anti")
            }
          incIdx.select(col(idCol).as("new_id"),
              col("band").as("_nband"), col("bucket"))
            .hint("shuffle_hash")
            .join(base.select(col(idCol).as("base_id"), col("band"),
              col("bucket")), Seq("bucket"))
            .filter((col("_nband") - col("band")) === 0)
            .select(col("new_id"), col("base_id"))
            .distinct()
        case None => Seq.empty[(Long, Long)].toDF("new_id", "base_id")
      }
      val haveLabels = VersionedTable.versions(spark, labelsPath).nonEmpty
      // forgotten docs' OWN label rows drop out of the fold (their
      // transitive connectivity legacy stays — see [[forget]])
      val baseLabels =
        if (haveLabels) BucketedState.servedOn(spark, idxPath,
          VersionedTable.read(spark, labelsPath), idCol)
        else Seq.empty[(Long, Long)].toDF(idCol, "cluster")
      val labels = Dedup.incrementalClusters(
        baseLabels.select(col(idCol), col("cluster")), idCol, cross, intra)
      BucketedState.appendOnce(incIdx, idxPath, batchId, "bucket",
        nBuckets, prePartitioned = true)
      VersionedTable.streamingCommit(labels, batchId, labelsPath,
        "overwrite")
    }
  }

  /** FORGET documents — the incremental-CC takedown, with the honest
    * contract: the ids' banded index rows are tombstoned (they can
    * never connect a future arrival) and their OWN label rows drop out
    * of [[served]] and of every subsequent fold, exactly once per
    * `forgetId`. What deliberately does NOT happen: clusters the doc
    * transitively BRIDGED are not re-split — incremental CC cannot
    * un-merge without a recompute, and staying merged is the
    * conservative direction for dedup (never under-groups). A periodic
    * batch rebuild (`Dedup.clusterDocs` over the served corpus) is the
    * retroactive pass, same as for every ingest-time gate. */
  def forget(spark: org.apache.spark.sql.SparkSession, idxPath: String,
      idCol: String, ids: Seq[Long], forgetId: Long): Unit = {
    import spark.implicits._
    BucketedState.forget(spark, idxPath, ids.toDF(idCol), forgetId)
  }

  /** The latest label snapshot SERVED through the takedown tombstones
    * (forgotten docs' own rows excluded). */
  def served(spark: org.apache.spark.sql.SparkSession, idxPath: String,
      labelsPath: String, idCol: String): DataFrame =
    BucketedState.servedOn(spark, idxPath,
      VersionedTable.read(spark, labelsPath), idCol)
}
