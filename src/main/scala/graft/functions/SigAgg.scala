package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate (the `Aggregator` API): element-wise minimum
  * of MinHash signatures. Folding every member's signature gives the
  * signature OF THE UNION of their shingle sets — a corpus/shard-level
  * sketch usable to estimate cross-shard Jaccard without touching the
  * documents again. Partial aggregation applies (reduce/merge are
  * associative + commutative), so the shuffle carries one k-long array
  * per (group, partition).
  */
object SigAgg {

  private object MinSigUnion
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty[Long]
    override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
      if (b.isEmpty) a.toArray
      else {
        var i = 0
        while (i < b.length) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
        b
      }
    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        var i = 0
        while (i < b1.length) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
        b1
      }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** Column-API aggregate: `df.groupBy(g).agg(SigAgg.minhashUnion(col("mh")))`. */
  val minhashUnion = udaf(MinSigUnion)

  /** Misra-Gries heavy-hitter SKETCH (k counters): any item with true
    * frequency > n/(k+1) is GUARANTEED present in the final summary,
    * with bounded memory no matter how large or skewed the stream.
    *
    * reduce is the classic decrement-all step; merge sums counters then
    * subtracts the (k+1)-th largest (the standard mergeable-summaries
    * construction, Agarwal et al.), so partial aggregation applies and
    * the shuffle carries at most k (item, count) pairs per partition —
    * the heavy-hitter analogue of how HLL makes distinct-counts
    * mergeable. Counts are lower bounds (order-dependent), but the
    * CONTAINMENT guarantee is deterministic — which is exactly what the
    * oracle checks (the same flag pattern as the approx-agg queries). */
  /** The MG decrement-all insert step — shared by the batch aggregator
    * and the streaming processor (StatefulOps.misraGriesTws), so both
    * paths apply the identical sketch transition. */
  private[graft] def mgInsert(m: Map[String, Long], item: String,
      k: Int): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None =>
        m.foldLeft(Map.empty[String, Long]) { case (acc, (x, c)) =>
          if (c > 1) acc.updated(x, c - 1) else acc
        }
    }

  /** Mergeable-summaries combine (Agarwal et al.): sum then subtract the
    * (k+1)-th largest. Shared for the same reason as [[mgInsert]]. */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val c = (a.keySet ++ b.keySet).iterator
      .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap
    if (c.size <= k) c
    else {
      val cut = c.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      c.foldLeft(Map.empty[String, Long]) { case (acc, (x, v)) =>
        if (v > cut) acc.updated(x, v - cut) else acc
      }
    }
  }

  private final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
      mgInsert(m, item, k)
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(a, b, k)
    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder = ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder = ExpressionEncoder[Map[String, Long]]()
  }

  /** `df.agg(SigAgg.misraGries(64)(col("w")))` → item→count sketch map. */
  def misraGries(k: Int) = udaf(new MisraGries(k))

  /** KMV (k-minimum-values) DISTINCT-COUNT sketch: keeps the k smallest
    * distinct hash values seen. With hashes ~uniform on [0, P), the
    * k-th smallest value m estimates the cardinality as
    * (k-1) · P / m (Bar-Yossef et al. 2002; the Theta-sketch family).
    *
    * Why this over approx_count_distinct: the state is a plain sorted
    * Long array with NO randomness beyond the fixed polyHash family, so
    * the sketch — and therefore the estimate — is bit-identical across
    * engines, partitionings, and reruns, which lets the DuckDB oracle
    * hash-match it exactly. reduce/merge are associative + commutative
    * (sorted-merge of sorted sets, keep k smallest), so partial
    * aggregation applies: the shuffle carries ≤ k longs per
    * (group, partition) no matter how many rows feed it — the
    * bounded-memory path to distinct counts over 100 TB where an exact
    * `count_distinct` would shuffle every value. */
  /** Insert one hash into a sorted k-min array (returns the input array
    * unchanged when the hash is present or above the k-th minimum).
    * Shared by the batch Aggregator and the streaming KMV processor so
    * both paths maintain bit-identical sketches. */
  private[graft] def kmvInsert(b: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already in the sketch
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val r = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, r, 0, ins)
        r(ins) = h
        System.arraycopy(b, ins, r, ins + 1, b.length - ins)
        r
      } else if (ins >= k) b // above the current k-th minimum
      else {
        val r = new Array[Long](k)
        System.arraycopy(b, 0, r, 0, ins)
        r(ins) = h
        System.arraycopy(b, ins, r, ins + 1, k - ins - 1)
        r
      }
    }
  }

  private final class KmvSketch(k: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], h: Long): Array[Long] =
      kmvInsert(b, h, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { // sorted-merge distinct, keep the k smallest
        val r = new Array[Long](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var n = 0
        while (n < k && (i < a.length || j < b.length)) {
          val take =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) {
              if (j < b.length && a(i) == b(j)) j += 1
              val v = a(i); i += 1; v
            } else { val v = b(j); j += 1; v }
          r(n) = take; n += 1
        }
        if (n == r.length) r else java.util.Arrays.copyOf(r, n)
      }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** `df.groupBy(g).agg(SigAgg.kmv(64)(col("h")))` → k smallest distinct
    * hashes, sorted ascending. Estimate downstream:
    * `IF(size(sk) < k, size(sk), (k-1) * P / sk[k-1])`. */
  def kmv(k: Int) = udaf(new KmvSketch(k))

  /** Exact quantized GRAM/covariance components of a d-dim float-vector
    * column in ONE aggregation pass. Each vector is quantized
    * `q_i = floor(v_i * 10000)` (floor has no halfway case — see the
    * embedding-stats quantization note) and the buffer accumulates, in
    * exact 64-bit integer space,
    * `[n, sum(q_0..q_{d-1}), dot(q_i*q_j) for i<=j]` — a flat array of
    * `1 + d + d(d+1)/2` longs. reduce/merge are element-wise sums
    * (associative + commutative), so partial aggregation applies and
    * the shuffle carries ONE fixed-size array per partition no matter
    * how many vectors feed it — the d×d second-moment matrix over
    * 100 TB of embeddings costs one narrow scan plus a single-row
    * exchange (the classic distributed-PCA input). The self-join
    * alternative (explode × explode on vec_id) would shuffle
    * n·d(d+1)/2 rows; this shuffles d(d+1)/2 LONGS total.
    *
    * Overflow headroom: |q| ≤ 1e4·max|v|; with unit-scale embeddings a
    * pair product is ≤ 1e8, so sums stay under 2^63 up to ~9e10
    * vectors — beyond that, shard the aggregation and combine in
    * DECIMAL(38,0). */
  private final class CovComponents(d: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val len = 1 + d + d * (d + 1) / 2
    override def zero: Array[Long] = Array.empty
    override def reduce(b0: Array[Long], v: Seq[Float]): Array[Long] = {
      if (v == null || v.length != d) return b0
      val b = if (b0.isEmpty) new Array[Long](len) else b0
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        q(i) = math.floor(v(i).toDouble * 10000.0).toLong
        b(1 + i) += q(i)
        i += 1
      }
      b(0) += 1
      var p = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(p) += q(i) * q(j); p += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
    override def finish(b: Array[Long]): Seq[Long] =
      (if (b.isEmpty) new Array[Long](len) else b).toSeq
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** Bottom-k UNIFORM ROW SAMPLE keyed by a fixed hash — the quantile
    * sketch of the KMV family. State: the (hash, value) pairs with the
    * k smallest DISTINCT hashes, interleaved `[h0,v0,h1,v1,…]` sorted
    * by hash; equal hashes keep the SMALLER value, so the state is a
    * pure function of the input SET (order- and partitioning-
    * independent — no RNG, no insertion-order dependence — which is
    * what lets the DuckDB oracle reproduce the sample, and therefore
    * the quantile estimates, bit-for-bit). With hashes of a unique row
    * key uniform on [0, P), the surviving rows are a uniform random
    * k-subset, so the sample's order statistics estimate the group's
    * quantiles with the classic bounded-sample guarantees.
    *
    * reduce/merge are associative + commutative (sorted-merge keep-k,
    * min-value on hash ties), so partial aggregation applies: the
    * shuffle carries ≤ 2k longs per (group, partition) however many
    * rows feed it — exact `percentile` over 100 TB needs a per-group
    * sort of everything; this needs one bounded array. finish returns
    * the sampled values sorted ASCENDING (hashes dropped): index
    * `floor((n-1)·p)` (0-based) is the p-quantile estimate. */
  /** Insert one (hash, value) pair into an interleaved `[h,v,…]`
    * sorted-by-hash bottom-k pair array (hash tie keeps the smaller
    * value; above-k hashes are dropped). Shared by the batch
    * [[bottomKSample]] Aggregator and the streaming quantile-sample
    * processor so both paths maintain bit-identical samples. */
  private[graft] def bottomKInsert(
      b: Array[Long], h: Long, v: Long, k: Int): Array[Long] = {
    val n = b.length / 2
    // binary search over the hash slots (even indices)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(2 * mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && b(2 * lo) == h) { // hash tie: keep the smaller value
      if (v < b(2 * lo + 1)) b(2 * lo + 1) = v
      b
    } else if (n < k) {
      val r = new Array[Long](2 * n + 2)
      System.arraycopy(b, 0, r, 0, 2 * lo)
      r(2 * lo) = h; r(2 * lo + 1) = v
      System.arraycopy(b, 2 * lo, r, 2 * lo + 2, 2 * n - 2 * lo)
      r
    } else if (lo >= k) b // above the current k-th minimum hash
    else {
      val r = new Array[Long](2 * k)
      System.arraycopy(b, 0, r, 0, 2 * lo)
      r(2 * lo) = h; r(2 * lo + 1) = v
      System.arraycopy(b, 2 * lo, r, 2 * lo + 2, 2 * k - 2 * lo - 2)
      r
    }
  }

  private final class BottomKSample(k: Int)
      extends Aggregator[(Long, Long), Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], a: (Long, Long)): Array[Long] =
      bottomKInsert(b, a._1, a._2, k)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else { // sorted-merge on hash, min value on ties, keep k pairs
        val na = a.length / 2; val nb = b.length / 2
        val r = new Array[Long](2 * math.min(k, na + nb))
        var i = 0; var j = 0; var n = 0
        while (n < k && (i < na || j < nb)) {
          if (j >= nb || (i < na && a(2 * i) < b(2 * j))) {
            r(2 * n) = a(2 * i); r(2 * n + 1) = a(2 * i + 1); i += 1
          } else if (i >= na || b(2 * j) < a(2 * i)) {
            r(2 * n) = b(2 * j); r(2 * n + 1) = b(2 * j + 1); j += 1
          } else { // equal hashes
            r(2 * n) = a(2 * i)
            r(2 * n + 1) = math.min(a(2 * i + 1), b(2 * j + 1))
            i += 1; j += 1
          }
          n += 1
        }
        if (2 * n == r.length) r else java.util.Arrays.copyOf(r, 2 * n)
      }
    override def finish(b: Array[Long]): Seq[Long] = {
      val n = b.length / 2
      val vs = new Array[Long](n)
      var i = 0
      while (i < n) { vs(i) = b(2 * i + 1); i += 1 }
      java.util.Arrays.sort(vs)
      vs.toSeq
    }
    override def bufferEncoder = ExpressionEncoder[Array[Long]]()
    override def outputEncoder = ExpressionEncoder[Seq[Long]]()
  }

  /** `df.groupBy(g).agg(SigAgg.bottomKSample(256)(col("h"), col("q")))`
    * → the quantized values of the k rows with the smallest key
    * hashes, sorted ascending. */
  def bottomKSample(k: Int) = udaf(new BottomKSample(k))

  /** Count-min cell column for hash row `r`: the same pairwise hash
    * family as the batch `q_cmsketch` SQL (minhash's a_r/b_r constants),
    * shared by the streaming processor so batch and stream sketches are
    * bit-identical on identical input. */
  def cmCol(r: Long, h: Long, width: Int, p: Long = 1000000007L): Int =
    (((((1103515245L * r + 12345L) % p) * h +
      ((1299709L * r + 7919L) % p)) % p) % width).toInt

  /** `df.agg(SigAgg.covComponents(64)(col("embedding")))` → flat
    * `[n, d sums, d(d+1)/2 upper-triangle dot products]` (exact longs).
    * Unpack pair (i,j), i<=j, at 1-based flat index
    * `d + i*d - i*(i-1)/2 + (j-i) + 2`. */
  def covComponents(d: Int) = udaf(new CovComponents(d))
}
