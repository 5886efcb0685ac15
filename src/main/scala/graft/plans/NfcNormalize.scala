package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_nfc(string) -> string` — Unicode NFC normalization as a
  * native expression (java.text.Normalizer under the call, the JDK's
  * ICU-derived implementation of UAX #15): the canonical-composition
  * step that must run BEFORE any hash-based dedup or fingerprinting
  * sees text, because "é" (U+00E9) and "e"+U+0301 are byte-distinct
  * spellings of the same grapheme — a corpus mixing sources that
  * disagree about composition silently splits every duplicate class
  * at the hash layer (the encoding_audit family's cousin: mojibake
  * detection finds BROKEN bytes, this finds VALID bytes spelled two
  * ways).
  *
  * Fast path: `Normalizer.isNormalized` is a scan-only check (no
  * allocation) and virtually all real text IS already NFC — the
  * expensive normalize+realloc runs only on the rows that need it.
  * The expression stays inside whole-stage codegen via a static
  * helper call (the NormalizeText pattern).
  *
  * The DuckDB oracle twin is `nfc_normalize()` (utf8proc) — both
  * implement the same UAX #15 tables, and the driver corpus is
  * ASCII (trivially NFC, engine-equal by construction); the planted
  * spec drives combining sequences through the JDK side and checks
  * against hand-composed expectations.
  */
object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any =
    NfcNormalize.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.NfcNormalize.nfc($a)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalizeExpr = copy(child = newChild)
}
