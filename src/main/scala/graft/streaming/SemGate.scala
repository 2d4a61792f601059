package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity}
import graft.sources.VersionedTable

/** Streaming SEMANTIC dedup gate — the ingest-time twin of
  * [[Similarity.semDedup]] and the gate a production training-data
  * pipeline runs hottest: every arriving embedding is checked against
  * everything seen so far AND its own batch for near-duplicates above
  * a cosine threshold, through the pinned ANN index's funnel, and the
  * discovered pairs APPEND to an output table whose cumulative content
  * provably equals [[Similarity.cellPairsFrozen]] over the stream's
  * prefix (`SemGateSpec` asserts it batch by batch).
  *
  * CONTRACT — SemDeDup with a frozen quantizer. The coarse k-means
  * codebook trains ONCE, on the first non-empty batch, over UNIT
  * vectors (committed as a [[VersionedTable]] — the release-pinned
  * quantizer), and every vector past and future keeps the cell that
  * codebook assigns. Within-cell pairs with exact cosine ≥ threshold
  * (over the ORIGINAL vectors) are the truth; a frozen quantizer is
  * what makes that truth PREFIX-MONOTONE (pairs only accumulate), i.e.
  * streamable with an append-only output — re-clustering per batch
  * would re-assign cells and retro-invalidate earlier verdicts.
  * Production SemDeDup runs exactly this regime between re-clusterings;
  * a re-cluster opens a new gate epoch (new state paths).
  *
  * FUNNEL — ADC shortlist + exact-cosine refine, with a PROVABLE
  * screen. The stored state is the IVF-PQ encoding of each unit
  * vector's cell residual ([[Similarity.pqTrainCodebook]], trained on
  * the same first batch) PLUS that vector's own quantization error
  * e(x) = ‖resid(x) − decode(codes(x))‖. For an arriving q and stored
  * x in the same cell, ADC gives a = ‖resid(q) − decode(codes(x))‖,
  * and the triangle inequality bounds the true unit-space distance:
  * ‖q̂−x̂‖ ≥ a − e(x). Since cos ≥ t ⟺ ‖q̂−x̂‖² ≤ 2−2t, any candidate
  * with a − e(x) > √(2−2t) + ε is PROVABLY below threshold and is
  * dropped before its float vector is ever fetched; survivors are
  * exact-cosine refined against the pinned stored vectors. The screen
  * is conservative by construction (ε covers float rounding), so the
  * output equals the unscreened exact operator bit-for-bit — the
  * oracle never needs to replay the PQ. A first batch too small to
  * seed `ks` codewords skips PQ training and the gate runs the same
  * joins unscreened (codes NULL) — output unchanged, by the same
  * argument.
  *
  * SCALE shape: both state tables are [[BucketedState]] — encodings
  * (cid, cell, codes, err) bucketed by `cell`, float vectors (id, v)
  * bucketed by `id` — so the per-batch cell join and the refine fetch
  * stream the accumulated state with NO exchange and NO sort; the
  * batch's shuffle bill is increment-sized forever (the SubstrGate
  * discipline). The screen means float vectors ride the refine join
  * only for candidates that might actually match; the corpus-sized
  * path carries byte codes. `ncells` should scale with the corpus
  * (√n cells keeps per-cell pair work flat — [[Similarity.semDedup]]'s
  * own sizing rule) and sets the cell join's parallelism floor.
  *
  * Exactly-once rides [[GateKit]]: the output commit is the completion
  * marker; state appends land before it, idempotent per batch id
  * ([[BucketedState.appendOnce]]); replays read state as it stood
  * before the batch by partition pruning ([[BucketedState.readBefore]])
  * — reading latest would pair the increment against its own replayed
  * encodings and double-report intra pairs as cross pairs. The
  * codebook commits are idempotent via their version listing (training
  * is deterministic, so a replayed train writes identical bytes). A
  * re-delivered id must not pair with its own stored copy (the batch
  * truth's id_a < id_b never emits self-pairs): the cid ≠ qid guard. */
object SemGate {

  /** `embeddings.writeStream.foreachBatch(SemGate.sink(...))`.
    * State lives under `statePath`: vectors/ enc/ coarse/ pq/. */
  def sink(statePath: String, outPath: String, idCol: String,
      vecCol: String, threshold: Double, ncells: Int = 8,
      kmIters: Int = 2, m: Int = 8, ks: Int = 16, sd: Int = 8,
      pqIters: Int = 1, nBuckets: Int = 32)
      : (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val vecPath = s"$statePath/vectors"
    val encPath = s"$statePath/enc"
    val coarsePath = s"$statePath/coarse"
    val pqPath = s"$statePath/pq"
    GateKit.runOnce(spark, outPath, batchId) {
      import spark.implicits._
      val inc = Dedup.persistTracked(batch.select(
        col(idCol).cast("long").as("id"), col(vecCol).as("v")))
      val n = inc.count()
      // ---- frozen quantizer: train once, on the first NON-EMPTY batch.
      // PQ commits BEFORE coarse: the coarse table is the "trained"
      // flag, so a crash between the two retrains both on replay
      // (deterministic — identical bytes), never half-trains.
      if (VersionedTable.versions(spark, coarsePath).isEmpty && n > 0) {
        val cent0 = Similarity.kmeansCodebook(
          inc.select(col("id"), Similarity.unitVec("v").as("nv")),
          "id", "nv", ncells, kmIters)
        if (n >= ks) {
          val res = Dedup.persistTracked(
            Similarity.assignFrozenCells(inc, "id", "v", cent0)
              .withColumn("resid", Similarity.frozenResidual(
                col("nv"), col("cell"), cent0))
              .select(col("vid"), col("resid")))
          // deterministic seed: the ks lowest ids of the training batch
          val seedIds = inc.orderBy("id").limit(ks)
            .collect().map(_.getLong(0))
          val cb = Similarity.pqTrainCodebook(res, "vid", "resid",
            s"vid IN (${seedIds.mkString(",")})", m, ks, sd, pqIters)
          if (VersionedTable.versions(spark, pqPath).isEmpty)
            VersionedTable.commit(cb, pqPath)
        }
        VersionedTable.commit(
          Similarity.centToFrame(spark, cent0), coarsePath)
      }
      if (VersionedTable.versions(spark, coarsePath).isEmpty) {
        // every batch so far was empty: nothing to state, empty commit
        VersionedTable.streamingCommit(
          Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "cosine"),
          batchId, outPath, "append")
      } else {
        val cent = Similarity.centFromFrame(
          VersionedTable.read(spark, coarsePath))
        val pq =
          if (VersionedTable.versions(spark, pqPath).nonEmpty)
            Some(VersionedTable.read(spark, pqPath))
          else None
        val asg = Dedup.persistTracked(
          Similarity.assignFrozenCells(inc, "id", "v", cent)
            .withColumn("resid", Similarity.frozenResidual(
              col("nv"), col("cell"), cent))
            .select(col("vid"), col("vv"), col("cell"), col("resid")))
        val encInc = pq match {
          case Some(cb) => asg.crossJoin(broadcast(cb))
            .select(col("vid").as("cid"), col("cell"), col("resid"),
              GraftFunctions.pqCodes(col("resid"), col("cb"), m, ks, sd)
                .as("codes"), col("cb"))
            .select(col("cid"), col("cell"), col("codes"),
              sqrt(GraftFunctions.pqAdc(col("resid"), col("codes"),
                col("cb"), m, sd)).as("err"))
          case None => asg.select(col("vid").as("cid"), col("cell"),
            lit(null).cast("array<bigint>").as("codes"),
            lit(null).cast("double").as("err"))
        }
        val cross = (BucketedState.readBefore(spark, encPath, batchId),
            BucketedState.readBefore(spark, vecPath, batchId)) match {
          case (Some(baseE), Some(baseV)) =>
            val q = asg.select(col("vid").as("qid"), col("cell"),
              col("resid").as("qres"))
            // increment = build side; the bucketed encoding STREAMS
            val cand = baseE
              .join(q.hint("shuffle_hash"), Seq("cell"))
              .filter(col("cid") =!= col("qid"))
            val radius = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))
            val screened = pq match {
              case Some(cb) => cand.crossJoin(broadcast(cb))
                // keep unless PROVABLY outside the radius (ε absorbs
                // float rounding — the screen must never falsely drop)
                .filter(col("codes").isNull || col("err").isNull ||
                  sqrt(GraftFunctions.pqAdc(col("qres"), col("codes"),
                    col("cb"), m, sd)) - col("err") <=
                    lit(radius + 1e-6))
              case None => cand
            }
            // the refine exchange carries BARE (qid, cid) pairs — 16
            // bytes per survivor, never a vector: the stored floats
            // stream out of the bucketed-by-id state, and the
            // increment's floats ride a broadcast (a micro-batch's
            // vectors are broadcast-sized by definition). Shipping qv
            // through this exchange instead was measured at 30× as a
            // ~16× larger per-batch shuffle that grew with state.
            screened.select(col("qid"), col("cid"))
              // survivors = build side; the bucketed vector state
              // STREAMS through the refine fetch
              .hint("shuffle_hash")
              .join(baseV.select(col("id").as("cid"), col("v").as("cv")),
                Seq("cid"))
              .join(broadcast(inc.select(col("id").as("qid"),
                col("v").as("qv"))), Seq("qid"))
              .select(col("qid"), col("cid"),
                GraftFunctions.cosineSim(col("qv"), col("cv"))
                  .as("cosine"))
              .filter(col("cosine") >= threshold)
              .select(least(col("qid"), col("cid")).as("id_a"),
                greatest(col("qid"), col("cid")).as("id_b"),
                col("cosine"))
          case _ =>
            Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "cosine")
        }
        val intra = asg
          .select(col("vid").as("id_a"), col("vv").as("v_a"), col("cell"))
          .join(asg.select(col("vid").as("id_b"), col("vv").as("v_b"),
            col("cell")), Seq("cell"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            GraftFunctions.cosineSim(col("v_a"), col("v_b")).as("cosine"))
          .filter(col("cosine") >= threshold)
        BucketedState.appendOnce(encInc, encPath, batchId, "cell",
          nBuckets)
        BucketedState.appendOnce(inc, vecPath, batchId, "id", nBuckets)
        VersionedTable.streamingCommit(cross.unionByName(intra), batchId,
          outPath, "append")
      }
    }
  }
}
