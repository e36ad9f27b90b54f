package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * canonicalization step multilingual dedup needs BEFORE fingerprints:
  * "café" spelled as e+U+0301 (decomposed) and as U+00E9 (precomposed)
  * are different byte strings, so without NFC every hash-keyed dedup
  * (exact, MinHash, SimHash, spans) silently treats equal-looking text
  * as distinct. The JDK's `java.text.Normalizer` implements the
  * Unicode standard algorithm; DuckDB's `nfc_normalize` implements the
  * same standard, which is what makes the operator fully value-
  * oracle-able for the stable (Latin/Greek/Cyrillic combining-mark)
  * range the corpus exercises.
  *
  * Hot-path shape: `Normalizer.isNormalized` runs the NFC quick-check
  * first, so for the overwhelmingly-common already-normalized (e.g.
  * pure-ASCII) row the expression allocates NOTHING and returns the
  * input buffer unchanged; only rows carrying decomposed sequences pay
  * the rebuild. Codegen'd via the static-helper pattern (no
  * CodegenFallback). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(v: Any): Any =
    NfcNormalize.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c)
}

object NfcNormalize {
  /** called from generated code */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }
}
