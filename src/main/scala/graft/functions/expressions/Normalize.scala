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
