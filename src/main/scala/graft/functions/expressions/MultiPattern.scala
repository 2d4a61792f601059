package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matcher over UTF-8 bytes.
  *
  * Built ONCE per expression instance (driver side) and shipped to
  * executors as a plan reference object (the [[BloomMightContain]]
  * pattern), so a blocklist of thousands of phrases costs one automaton
  * build, then every row is a single left-to-right scan of its text —
  * O(bytes + matches) regardless of how many patterns are loaded. The
  * per-pattern alternative (`m` × `regexp_count`/`replace` passes) scans
  * every document `m` times; at 100 TB that multiplies the whole corpus
  * read by the blocklist size.
  *
  * Counting semantics: per pattern, NON-OVERLAPPING occurrences taken
  * greedily from the left — exactly what SQL `replace(text, p, '')`
  * removes, so `(length(text) - length(replace(text, p, ''))) /
  * length(p)` is a differential oracle for every pattern independently.
  * (A raw Aho–Corasick emits overlapping ends; the `nextAllowed` cursor
  * below restores the greedy-left rule per pattern.)
  *
  * Matching is over UTF-8 bytes: valid UTF-8 is self-synchronizing
  * (continuation bytes never equal lead bytes), so a byte-level match of
  * a whole pattern always falls on character boundaries and byte counts
  * equal character-semantics counts.
  *
  * Sparse children (sorted byte + binary search per node) keep memory at
  * O(total pattern bytes), not O(nodes × 256) — a 50k-phrase blocklist
  * stays a few MB in the plan. */
final class AcAutomaton(patternBytes: Array[Array[Byte]]) extends Serializable {
  require(patternBytes.nonEmpty, "AcAutomaton: empty pattern list")
  require(patternBytes.forall(_.nonEmpty), "AcAutomaton: empty pattern")

  val nPatterns: Int = patternBytes.length
  private val patLen: Array[Int] = patternBytes.map(_.length)

  // --- trie build (temporary sparse maps, frozen to CSR below) ---
  private val (childStart, childByte, childId, fail, dict, patEnd) = {
    import scala.collection.mutable
    val kids = mutable.ArrayBuffer(mutable.TreeMap.empty[Int, Int])
    val ends = mutable.ArrayBuffer(-1)
    var p = 0
    while (p < patternBytes.length) {
      var node = 0
      val bs = patternBytes(p)
      var i = 0
      while (i < bs.length) {
        val b = bs(i) & 0xff
        node = kids(node).getOrElseUpdate(b, {
          kids += mutable.TreeMap.empty[Int, Int]; ends += -1; kids.length - 1
        })
        i += 1
      }
      require(ends(node) < 0, s"AcAutomaton: duplicate pattern at index $p")
      ends(node) = p
      p += 1
    }
    val n = kids.length
    val failA = new Array[Int](n)
    val dictA = new Array[Int](n)
    // BFS for fail links; child lookup during BFS uses the maps directly
    val queue = mutable.Queue.empty[Int]
    kids(0).foreach { case (_, c) => failA(c) = 0; queue.enqueue(c) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dictA(u) = if (ends(failA(u)) >= 0) failA(u) else dictA(failA(u))
      kids(u).foreach { case (b, c) =>
        var f = failA(u)
        while (f != 0 && !kids(f).contains(b)) f = failA(f)
        failA(c) = kids(f).get(b).filter(_ != c).getOrElse(0)
        queue.enqueue(c)
      }
    }
    // freeze children to CSR (bytes sorted — TreeMap iteration order)
    val starts = new Array[Int](n + 1)
    var total = 0
    var i = 0
    while (i < n) { starts(i) = total; total += kids(i).size; i += 1 }
    starts(n) = total
    val bytesA = new Array[Int](total)
    val idsA = new Array[Int](total)
    i = 0
    while (i < n) {
      var j = starts(i)
      kids(i).foreach { case (b, c) => bytesA(j) = b; idsA(j) = c; j += 1 }
      i += 1
    }
    (starts, bytesA, idsA, failA, dictA, ends.toArray)
  }

  /** Binary search for byte `b` among `node`'s children; -1 if absent. */
  private def child(node: Int, b: Int): Int = {
    var lo = childStart(node)
    var hi = childStart(node + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cb = childByte(mid)
      if (cb == b) return childId(mid)
      else if (cb < b) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Per-pattern greedy-left non-overlapping occurrence counts. */
  def countAll(text: UTF8String): GenericArrayData = {
    val counts = new Array[Long](nPatterns)
    val nextAllowed = new Array[Int](nPatterns)
    val n = text.numBytes()
    var st = 0
    var i = 0
    while (i < n) {
      val b = text.getByte(i) & 0xff
      var c = child(st, b)
      while (c < 0 && st != 0) { st = fail(st); c = child(st, b) }
      st = if (c >= 0) c else 0
      // report all patterns ending here (this node + dict-suffix chain)
      var m = if (patEnd(st) >= 0) st else dict(st)
      while (m != 0) {
        val p = patEnd(m)
        val start = i - patLen(p) + 1
        if (start >= nextAllowed(p)) {
          counts(p) += 1
          nextAllowed(p) = i + 1
        }
        m = dict(m)
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Per-row occurrence counts of a fixed pattern list: `array<bigint>`
  * aligned with `patterns`. The automaton rides the generated code as a
  * single reference object; the row cost is one scan of the text.
  *
  * Semantics match the SQL replace-count oracle per pattern (see
  * [[AcAutomaton]]), so the expression is differentially testable
  * against any engine with `replace`. */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "graft_multi_count requires a non-empty list of non-empty patterns")
  require(patterns.distinct.size == patterns.size,
    "graft_multi_count: duplicate patterns")

  @transient private lazy val ac =
    new AcAutomaton(patterns.map(_.getBytes("UTF-8")).toArray)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_count"
  protected override def nullSafeEval(input: Any): Any =
    ac.countAll(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countAll($c)")
  }
  override protected def withNewChildInternal(c: Expression): MultiPatternCounts =
    copy(child = c)
}
