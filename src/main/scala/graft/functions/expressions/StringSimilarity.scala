package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, bit-identical to DuckDB's
  * `jaro_winkler_similarity` (the oracle): standard Jaro with match
  * window `max(len)/2 - 1`, transpositions counted over matched
  * sequences, then the Winkler common-prefix boost (p = 0.1, prefix
  * capped at 4) applied only when the Jaro similarity exceeds 0.7.
  * Either input empty → 0.0 (including both-empty — DuckDB's choice,
  * verified empirically over 12k random pairs, exact double equality).
  *
  * The fold order of the final `(m/|a| + m/|b| + (m-t)/m) / 3` is fixed
  * left-to-right in IEEE doubles, so equal inputs give equal bits on
  * any platform; there is no order-dependent accumulation anywhere.
  *
  * Spark has `levenshtein` but no Jaro-Winkler; a UDF would box both
  * strings per row and block whole-stage codegen, so this is a native
  * expression with a static-forwarder body shared by interpreted eval
  * and generated Java.
  */
object StringSimImpl {
  /** All inputs run the UTF-8 BYTE loop: DuckDB's
    * jaro_winkler_similarity iterates bytes, not code points (verified
    * empirically — every non-ASCII pair tried matches the byte loop
    * exactly and diverges from a UTF-16 loop; StringSimilaritySpec pins
    * a non-ASCII corpus), so byte-wise is the oracle-parity semantics
    * for ASCII and non-ASCII alike. Also the fast path: no String/
    * char[] allocation per pair, which matters at millions of blocked
    * pairs per task. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double =
    jaroWinklerBytes(a.getBytes, b.getBytes)

  private def jaroWinklerBytes(s1: Array[Byte], s2: Array[Byte]): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](n1)
    val matched2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!matched2(j) && s2(j) == s1(i)) {
          matched1(i) = true
          matched2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < n1) {
      if (matched1(i)) {
        while (!matched2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    var sim =
      (m.toDouble / n1 + m.toDouble / n2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      var l = 0
      val maxPrefix = math.min(4, math.min(n1, n2))
      while (l < maxPrefix && s1(l) == s2(l)) l += 1
      sim += l * 0.1 * (1.0 - sim)
    }
    sim
  }

}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    StringSimImpl.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.StringSimImpl.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}
