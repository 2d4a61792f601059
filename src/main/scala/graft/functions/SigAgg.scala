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
}
