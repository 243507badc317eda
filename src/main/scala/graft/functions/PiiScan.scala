package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII detection + redaction as ONE row-local native expression — the
  * pretraining-hygiene step after dedup/decontamination: count and scrub
  * email addresses, phone numbers, and IPv4 addresses before a corpus
  * ships. Returns `struct<n_emails, n_phones, n_ipv4, redacted>`.
  *
  * The SEMANTICS ARE THE PATTERNS ([[PiiScan.EmailPattern]] etc.):
  * deterministic ASCII character-class regexes with no constructs where
  * Java's backtracking engine and RE2 (the DuckDB oracle's engine)
  * could disagree — leftmost-first alternation, greedy counted
  * repetition, and ASCII `\b` behave identically in both, so the DuckDB
  * oracle restates detection as `regexp_extract_all` and redaction as
  * the same nested `regexp_replace(..., 'g')` chain. No catastrophic
  * backtracking: every alternation branch is fixed-width and the only
  * unbounded quantifiers sit over disjoint character classes.
  *
  * Counts are per-pattern over the ORIGINAL text; redaction applies
  * sequentially (emails → phones → IPv4) so each stage sees the prior
  * stage's placeholders — placeholders contain no digits or `@`, so the
  * chain cannot manufacture new matches. Row-local: whole-stage
  * codegen, no shuffle, scales embarrassingly at 100 TB. */
case class PiiScan(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = PiiScan.schema
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pii_scan"

  override protected def nullSafeEval(v: Any): Any =
    PiiScan.kernel(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("pii")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.PiiScan.kernel($v.toString());
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScan {

  val schema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ipv4", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  /** RFC-5322-lite: dot-atom local part, dotted domain, alphabetic TLD
    * of ≥ 2 — the standard scrubbing pattern (full RFC grammar would
    * need constructs RE2 lacks and redacts nothing extra on real text). */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style `NNN-NNN-NNNN` / `NNN.NNN.NNNN` (mixed separators
    * allowed); `\b` on both ends keeps a longer digit run from leaking
    * a partial match. */
  val PhonePattern: String =
    "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"

  /** Octet-validated dotted quad (0–255 each; no leading-zero octets
    * beyond a bare 0 — `[1-9]?[0-9]` not `[0-9]{1,3}`), `\b`-anchored so
    * `999.999.999.999` and digit-embedded quads don't match. */
  val Ipv4Pattern: String = {
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    s"\\b$octet(\\.$octet){3}\\b"
  }

  val EmailTag = "[EMAIL]"
  val PhoneTag = "[PHONE]"
  val IpTag = "[IP]"

  private val EmailRe = java.util.regex.Pattern.compile(EmailPattern)
  private val PhoneRe = java.util.regex.Pattern.compile(PhonePattern)
  private val Ipv4Re = java.util.regex.Pattern.compile(Ipv4Pattern)

  private def countMatches(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  def kernel(text: String): InternalRow = {
    val nEmail = countMatches(EmailRe, text)
    val nPhone = countMatches(PhoneRe, text)
    val nIp = countMatches(Ipv4Re, text)
    // fast path: clean rows (the overwhelming majority of a real corpus)
    // skip the three replaceAll passes and return the input string as-is
    val redacted =
      if (nEmail == 0 && nPhone == 0 && nIp == 0) text
      else Ipv4Re.matcher(
        PhoneRe.matcher(
          EmailRe.matcher(text).replaceAll(
            java.util.regex.Matcher.quoteReplacement(EmailTag)))
          .replaceAll(java.util.regex.Matcher.quoteReplacement(PhoneTag)))
        .replaceAll(java.util.regex.Matcher.quoteReplacement(IpTag))
    new GenericInternalRow(Array[Any](
      nEmail, nPhone, nIp, UTF8String.fromString(redacted)))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(PiiScan(ColumnBridge.expression(text)))
}
