package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.VersionedTable

/** STREAMING near-dup cluster maintenance — the production loop of
  * `q_ingest_clusters2` as a `foreachBatch` sink: every micro-batch of
  * documents folds into the persistent cluster-label table via
  * [[Dedup.incrementalClusters]], with BOTH pieces of state — the label
  * table and the corpus's MinHash signature index — maintained as
  * [[VersionedTable]]s rather than executor memory.
  *
  * Per batch: sign ONLY the batch's documents; candidate pairs =
  * batch×stored-signatures (cross) ∪ batch×batch (intra); contract onto
  * the stored labels and commit the updated label SNAPSHOT plus the
  * batch's signature APPEND. Every committed label version is the true
  * CC of all documents seen so far ([[Dedup.incrementalClusters]]'
  * batch-equivalence argument, applied inductively per batch), so a
  * reader at any version sees a consistent, recompute-equal clustering.
  *
  * Exactly-once and crash windows ride [[GateKit]]: both commits are
  * idempotent per batch id, the label commit is the completion marker
  * ([[GateKit.runOnce]]), signatures commit FIRST, and the orders of a
  * replayed partial failure both converge —
  *  - labels landed, signatures did not: the replay re-commits only the
  *    signatures; the committed labels were computed from the batch's
  *    own in-memory signatures, so they are already correct;
  *  - signatures landed, labels did not: the replay PINS the
  *    cross-candidate join to the signature version PRECEDING the
  *    batch's own append ([[GateKit.pinnedBefore]]), so it joins
  *    exactly the index the no-crash run would have — without the
  *    pin, the batch's own replayed signatures would also sit in the
  *    index, and under a finite `maxBucket` those extra rows can push a
  *    (band, bucket) over the cap and DROP genuine increment-vs-base
  *    pairs (self-pairs and duplicate intra pairs are harmless for
  *    connectivity, but cap-induced drops are not), diverging the
  *    replayed labels from the no-crash result.
  *
  * State size at 100 TB: signatures are k longs per doc (the index a
  * batch joins is bucket-keyed and increment-sized per
  * [[Dedup.crossCandidatesFromSignatures]]); labels are one (id, rep)
  * row per PAIRED doc; neither lives on an executor heap, and recovery
  * is "read the last committed versions" — no state-store rebuild. */
object ClusterMaintainer {

  /** `ds.writeStream.foreachBatch(ClusterMaintainer.sink(...))`. */
  def sink(labelsPath: String, sigPath: String, idCol: String,
      textCol: String, maxBucket: Int = Int.MaxValue)
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
      val cross = GateKit.readPinnedBefore(spark, sigPath, batchId) match {
        case Some(base) =>
          Dedup.crossCandidatesFromSignatures(sigsNew, base, idCol,
            maxBucket = maxBucket)
        case None => Seq.empty[(Long, Long)].toDF("new_id", "base_id")
      }
      val haveLabels = VersionedTable.versions(spark, labelsPath).nonEmpty
      val baseLabels =
        if (haveLabels) VersionedTable.read(spark, labelsPath)
        else Seq.empty[(Long, Long)].toDF(idCol, "cluster")
      val labels = Dedup.incrementalClusters(
        baseLabels.select(col(idCol), col("cluster")), idCol, cross, intra)
      VersionedTable.streamingCommit(sigsNew, batchId, sigPath, "append")
      VersionedTable.streamingCommit(labels, batchId, labelsPath,
        "overwrite")
    }
  }
}
