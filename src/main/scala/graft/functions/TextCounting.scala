package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The nine Gopher-rule counting stats as ONE native expression
  * returning `array<long>[n_tokens, sum_len, n_lines, n_bullet,
  * n_ell_line, n_hash, n_ellipsis, n_alpha, n_stop]`.
  *
  * Replaces the composed form in
  * [[graft.operators.TextAnalysis.gopherRules]] — two splits, a
  * regexp_replace, two string replaces, and FOUR interpreted
  * higher-order lambdas (the alpha-word one ran `rlike("[a-z]")` per
  * token) — with a single codegen'd kernel; the composed form read
  * 167 s at the 100× probe against the ~22 s scan-bound baseline.
  *
  * Bit-parity contract with the composed form (pinned by the
  * PipelineSpec parity case; the p41/p38 DuckDB oracles are unchanged):
  *  - n_tokens / sum_len exactly as [[QualityStats]] (`tokenCount` and
  *    `length(regexp_replace(trim(t), "\\s+", ""))`);
  *  - lines ≡ `split(t, "\n", -1)`: n_lines = '\n' count + 1 (trailing
  *    empty line kept); bullet ≡ `LIKE '- %' OR LIKE '* %'` (first two
  *    chars); ellipsis line ≡ `LIKE '%...'` (last three chars);
  *  - n_hash ≡ '#' occurrences; n_ellipsis ≡ non-overlapping "..."
  *    occurrences scanning left-to-right (the `replace` closed form);
  *  - n_alpha ≡ tokens of `split(trim(lower(t)), "\\s+")` containing
  *    at least one [a-z] char (`rlike("[a-z]")` after lowercasing);
  *    n_stop ≡ tokens in the 20-word lexicon.
  * Null-intolerant; callers coalesce NULL to blank first.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gopher_stats"

  override protected def nullSafeEval(v: Any): Any =
    GopherStats.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.GopherStats.kernel($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherStats {

  def apply(text: Column): Column =
    ColumnBridge.column(GopherStats(ColumnBridge.expression(text)))

  import TextKernelUtil.{isWs, splitCount, stopwords}

  def kernel(text: UTF8String): ArrayData = {
    val raw = text.toString
    // pass 1 — raw string: non-\s codepoints, '#', non-overlapping
    // "...", and line structure ('\n'-split with trailing empty kept)
    var sumLen = 0L
    var nHash = 0L
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      if (cp == '#') nHash += 1
      if (!(cp < 128 && isWs(cp.toChar))) sumLen += 1
      i += Character.charCount(cp)
    }
    var nEllipsis = 0L
    i = 0
    while (i + 2 < raw.length) {
      if (raw.charAt(i) == '.' && raw.charAt(i + 1) == '.' && raw.charAt(i + 2) == '.') {
        nEllipsis += 1; i += 3
      } else i += 1
    }
    var nLines = 1L
    var nBullet = 0L
    var nEllLine = 0L
    var lineStart = 0
    i = 0
    while (i <= raw.length) {
      if (i == raw.length || raw.charAt(i) == '\n') {
        val len = i - lineStart
        if (len >= 2 && (raw.charAt(lineStart) == '-' || raw.charAt(lineStart) == '*') &&
          raw.charAt(lineStart + 1) == ' ') nBullet += 1
        if (len >= 3 && raw.charAt(i - 1) == '.' && raw.charAt(i - 2) == '.' &&
          raw.charAt(i - 3) == '.') nEllLine += 1
        if (i < raw.length) nLines += 1
        lineStart = i + 1
      }
      i += 1
    }
    // n_tokens over the space-trimmed ORIGINAL (tokenCount contract)
    val trimmed = text.trim.toString
    val nTok = if (trimmed.isEmpty) 0L else splitCount(trimmed)
    // pass 2 — lowercased tokens: alpha-bearing and stopword counts
    val lower = text.toLowerCase.trim.toString
    var nAlpha = 0L
    var nStop = 0L
    var start = 0
    var j = 0
    var hasAlpha = false
    while (j <= lower.length) {
      if (j == lower.length || isWs(lower.charAt(j))) {
        if (j > start) {
          if (hasAlpha) nAlpha += 1
          if (stopwords.contains(lower.substring(start, j))) nStop += 1
        }
        hasAlpha = false
        start = j + 1
      } else if (lower.charAt(j) >= 'a' && lower.charAt(j) <= 'z') hasAlpha = true
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(
      nTok, sumLen, nLines, nBullet, nEllLine, nHash, nEllipsis, nAlpha, nStop))
  }
}

/** BPE-ish subword count as one native expression — the closed form of
  * `size(filter(split(t, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
  * p => length(trim(p)) > 0))`: maximal ASCII-alphanumeric runs count
  * one piece each, and every non-alphanumeric codepoint is its own
  * piece unless it is a SPACE (Spark's trim strips only spaces, so a
  * tab/newline piece survives the filter — preserved quirk). This is
  * the same closed form the p16 DuckDB oracle already restates; the
  * lookaround split materialized a piece array and ran an interpreted
  * filter lambda per row (114 s at the 100× probe). Null-intolerant;
  * the [[graft.operators.TextAnalysis.subwordCount]] wrapper keeps the
  * composed form's null-in/null-out behavior. */
case class SubwordCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_subword_count"

  override protected def nullSafeEval(v: Any): Any =
    SubwordCountExpr.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SubwordCountExpr.kernel($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordCountExpr {

  def apply(text: Column): Column =
    ColumnBridge.column(SubwordCountExpr(ColumnBridge.expression(text)))

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')

  def kernel(text: UTF8String): Int = {
    val s = text.toString
    var count = 0
    var inRun = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (isAlnum(cp)) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        inRun = false
        if (cp != ' ') count += 1
      }
      i += Character.charCount(cp)
    }
    count
  }
}
