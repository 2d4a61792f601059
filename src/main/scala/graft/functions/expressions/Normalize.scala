package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM side of [[NfcNormalize]] — kept in an object so generated code
  * calls one static-ish method. ASCII fast path: NFC is the identity on
  * ASCII, so the overwhelmingly-common case skips the String round-trip
  * entirely (no allocation, no Normalizer walk). */
object NormalizeImpl {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII ⇒ already NFC; avoid decode/normalize/encode
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = s.getByte(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}

/** JVM side of [[HilbertKey]]: the iterative xy2d walk (the standard
  * rotate-and-accumulate form). Bit-identical to the unrolled
  * [[graft.functions.XFormulas.hilbertX]]/Y/D CASE-fragment chain the
  * DuckDB oracle runs — HilbertSpec pins the equality exhaustively. */
object HilbertImpl {
  def xy2d(xIn: Long, yIn: Long, order: Int): Long = {
    var x = xIn; var y = yIn
    val n = 1L << order
    var s = n >> 1
    var d = 0L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // flip (when rx = 1) then swap
        val nx = if (rx == 1) n - 1 - y else y
        val ny = if (rx == 1) n - 1 - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve key of an (x, y) cell: ONE codegen'd static call per
  * row instead of a 10-level chained-Project rotate-and-accumulate —
  * the chain's generated code is large enough that every plan shape
  * containing it pays seconds of Janino compilation (measured ~2.5 s
  * per distinct stage), while this expression is a single invoke. The
  * SQL-fragment chain stays as the oracle's form and the differential
  * proof ([[graft.functions.XFormulas.hilbertX]], HilbertSpec). */
case class HilbertKey(left: Expression, right: Expression, order: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be in [1, 31], got $order")
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.LongType &&
      right.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint coordinates, got " +
        s"${left.dataType} / ${right.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hilbert"
  protected override def nullSafeEval(x: Any, y: Any): Any =
    HilbertImpl.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long], order)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.expressions.HilbertImpl.xy2d($x, $y, $order)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertKey = copy(left = l, right = r)
}

/** Unicode NFC normalization (canonical composition): `café` typed as
  * `e`+COMBINING ACUTE and as the precomposed U+00E9 become the SAME
  * string, so fingerprint/exact-dedup stages stop treating visually
  * identical documents as distinct. Normalize-then-hash is the standard
  * first stage of a web-corpus cleaner (mixed editors/OCR/keyboards emit
  * both forms for the same page).
  *
  * NFC is specified by Unicode (UAX #15), so the JVM's
  * `java.text.Normalizer` and DuckDB's utf8proc-backed `nfc_normalize`
  * produce identical bytes — the operator keeps an exact differential
  * oracle. A narrow codegen'd map with an ASCII no-allocation fast path:
  * runs inside the scan stage, nothing shuffles. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"
  protected override def nullSafeEval(input: Any): Any =
    NormalizeImpl.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NormalizeImpl.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
