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
  * Exactly-once and crash windows: both commits are idempotent per
  * batch id ([[VersionedTable.streamingCommit]] skips tagged replays).
  * Signatures commit FIRST; the orders of a replayed partial failure
  * both converge —
  *  - labels landed, signatures did not: the replay re-commits only the
  *    signatures; the committed labels were computed from the batch's
  *    own in-memory signatures, so they are already correct;
  *  - signatures landed, labels did not: the replay recomputes labels
  *    with the batch's signatures ALSO present in the stored index; the
  *    extra cross pairs this produces are self-pairs (dropped by the CC
  *    — u = v edges are filtered) and duplicates of the intra pairs
  *    (idempotent for connectivity), so the label result is unchanged.
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
    if (!VersionedTable.committedBatches(spark, labelsPath)
        .contains(batchId)) {
      import spark.implicits._
      val sigsNew = Dedup.persistTracked(
        Dedup.minhashSignatures(batch, idCol, textCol))
      val intra = Dedup.candidatesFromSignatures(sigsNew, idCol)
        .select(col("doc_a"), col("doc_b"))
      val haveSigs = VersionedTable.versions(spark, sigPath).nonEmpty
      val cross =
        if (haveSigs)
          Dedup.crossCandidatesFromSignatures(sigsNew,
            VersionedTable.read(spark, sigPath), idCol,
            maxBucket = maxBucket)
        else Seq.empty[(Long, Long)].toDF("new_id", "base_id")
      val haveLabels = VersionedTable.versions(spark, labelsPath).nonEmpty
      val baseLabels =
        if (haveLabels) VersionedTable.read(spark, labelsPath)
        else Seq.empty[(Long, Long)].toDF(idCol, "cluster")
      val labels = Dedup.incrementalClusters(
        baseLabels.select(col(idCol), col("cluster")), idCol, cross, intra)
      VersionedTable.streamingCommit(sigsNew, batchId, sigPath, "append")
      VersionedTable.streamingCommit(labels, batchId, labelsPath,
        "overwrite")
      Dedup.releaseCaches()
    }
  }
}
