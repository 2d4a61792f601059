package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions
import graft.functions.XFormulas._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Scale design: `bruteForceTopK` broadcasts the (small) query set and
  * scans candidates once — the right plan when queries ≪ candidates;
  * cost is O(|queries| × |candidates|) dot products with NO shuffle of
  * the candidate table (ranking shuffles only the per-partition top-k
  * survivors after a partial sort). `lshTopK` is the scale path: a
  * random-hyperplane signature bucket join probes only matching buckets,
  * trading recall for a candidate set that shrinks ~2^nbits-fold.
  */
object Similarity {

  /** Exact top-k neighbors per query by cosine, ties broken by id.
    *
    * GUARD: the plan is O(|queries| × |candidates|) — correct only for
    * small query sets. The query side is counted eagerly (one cheap job
    * over the side that must be broadcast-sized anyway) and the call
    * fails fast above `maxQueries` instead of silently launching a
    * quadratic job; callers with large query sets should use [[lshTopK]]
    * or [[ivfTopK]], whose candidate work is divided by the bucket count
    * (auto-routing is deliberately NOT done — those paths are
    * approximate, and silently degrading exact results would be a
    * correctness surprise). */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxQueries: Long = 100000L): DataFrame = {
    val nq = queries.count()
    require(nq <= maxQueries,
      s"bruteForceTopK: $nq queries exceeds maxQueries=$maxQueries; " +
        "the crossJoin plan is quadratic — use lshTopK or ivfTopK for " +
        "large query sets, or raise maxQueries explicitly")
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = candidates.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val scored = q.crossJoin(c).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosineSim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style approximate top-k: both sides are assigned to the
    * argmax-dot cell of a fixed coarse-quantizer codebook (deterministic
    * pseudo-centroids; a production build would k-means them), and each
    * query probes ONLY its own cell (nprobe = 1). Versus LSH banding the
    * candidate partition is data-adaptive: cells follow the vector
    * distribution, so at 100 TB the per-query probe cost is ~|candidates|
    * / ncells with one equi-join shuffle on the cell id — and skewed
    * (hot) cells are visible to AQE's skew-join splitting as ordinary
    * join-key skew. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, ncells: Int = 16): DataFrame = {
    def cell(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        GraftFunctions.ivfCell(col(vecCol), ncells).as("cell"))
    val q = broadcast(cell(queries, "qid", "qv"))
    val c = cell(candidates, "cid", "cv")
    val scored = q.join(c, "cell").filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosineSim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: only candidates whose LSH signature matches the
    * query's. Recall < 1; candidate work divided by ~2^nbits. */
  def lshTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nbits: Int = 8, dim: Int = 64): DataFrame = {
    def sig(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        GraftFunctions.simSig(col(vecCol), nbits).as("sig"))
    val q = broadcast(sig(queries, "qid", "qv"))
    val c = sig(candidates, "cid", "cv")
    val scored = q.join(c, "sig").filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        GraftFunctions.cosineSim(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
