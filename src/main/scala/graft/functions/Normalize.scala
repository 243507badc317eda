package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the
  * pre-tokenization normalization step every real pipeline runs
  * (sentencepiece defaults to an NFKC variant; NFC is the
  * byte-stability floor): combining sequences compose to their
  * canonical precomposed forms, so visually identical text hashes,
  * dedups, and tokenizes identically. Row-local, zero exchange;
  * `java.text.Normalizer` implements the same Unicode canonical
  * composition DuckDB's utf8proc does, which is what makes the p84
  * gate's full-text comparison possible. NULL-propagating. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NfcNormalize.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NfcNormalize.kernel($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: quick-check avoids materializing a copy of the (at
    // 100 TB overwhelmingly already-NFC) corpus
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

/** Unicode NFKC normalization — the COMPATIBILITY composition a
  * tokenizer trainer actually expects (sentencepiece's default is an
  * NFKC variant): everything NFC does, plus compatibility folds —
  * ligatures (ﬁ→fi), super/subscripts (²→2), squared units (㎞→km),
  * full/half-width forms (Ａ→A), enclosed alphanumerics (⑦→7). A
  * multilingual corpus normalized NFC-only diverges from the
  * tokenizer's view of the same bytes; this is the rung that closes
  * that gap. Same fast-path/NULL contract as [[NfcNormalize]].
  *
  * DOCUMENTED DIVERGENCE from sentencepiece's `nmt_nfkc`: that variant
  * adds hand-maintained NMT rules ON TOP of NFKC (control-char
  * removal, some space folds, a handful of exceptions carved OUT of
  * NFKC) — those rules live in a generated TSV in sentencepiece, not
  * in the Unicode standard, and are not implemented here; this
  * expression is exactly Unicode NFKC (java.text.Normalizer, same
  * algorithm utf8proc implements). */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_nfkc_normalize"

  override protected def nullSafeEval(v: Any): Any =
    NfkcNormalize.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.NfkcNormalize.kernel($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfkcNormalize {
  def kernel(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFKC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(NfkcNormalize(ColumnBridge.expression(c)))
}
