package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The four corpus-quality counting stats as ONE native expression
  * returning `array<long>[n_tokens, n_punct, n_stop, n_wordchars]`.
  *
  * Replaces the composed form in
  * [[graft.operators.TextAnalysis.qualityMetrics]] — four separate
  * passes (two `regexp_replace` rewrites, a `split` materializing a
  * token ArrayData, and a `filter(tokens, _.isin(stopwords))`
  * higher-order lambda, which is CodegenFallback/interpreted) — with a
  * single codegen'd kernel. The 100× probe that motivated it: p09 read
  * 111 s at 100× (7× over linear) while the one-regex p08 scan was
  * ~linear; the interpreted stopword lambda and repeated text rewrites
  * were the gap.
  *
  * Bit-exact with the composed form it replaced (pinned by the
  * PipelineSpec parity case and the unchanged p09/p30/p47/st03 DuckDB
  * oracles):
  *  - n_tokens ≡ `when(length(trim(t)) = 0, 0)
  *    .otherwise(size(split(trim(t), "\\s+")))` — UTF8String.trim is
  *    ASCII-SPACE-only, split keeps leading/trailing empty tokens
  *    (limit -1), so `"\na"` counts 2 and a tabs-only string counts 2;
  *  - n_punct ≡ `length(t) - length(regexp_replace(t, "[\\p{Punct}]",
  *    ""))` — Java's \p{Punct} is the 32 ASCII punctuation characters
  *    (no Unicode classes without the flag), counted per codepoint;
  *  - n_stop ≡ `size(filter(split(trim(lower(t)), "\\s+"),
  *    _.isin(Stopwords)))` — maximal non-\s runs of the lowercased
  *    text matched against the 20-word lexicon;
  *  - n_wordchars ≡ `length(regexp_replace(trim(t), "\\s+", ""))` —
  *    codepoints outside Java regex \s = [ \t\n\f\r] (trim only
  *    strips spaces, which are \s, so whole-string counting is
  *    equivalent).
  * The raw expression is null-intolerant; the qualityMetrics wrapper
  * coalesces NULL to blank first (NULL ≡ blank contract).
  */
case class QualityStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quality_stats"

  override protected def nullSafeEval(v: Any): Any =
    QualityStats.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QualityStats.kernel($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityStats {

  def apply(text: Column): Column =
    ColumnBridge.column(QualityStats(ColumnBridge.expression(text)))

  import TextKernelUtil.{isWs, splitCount, stopwords}

  /** Java regex \p{Punct}: the 32 ASCII punctuation characters. */
  private val punctMask: Array[Boolean] = {
    val m = new Array[Boolean](128)
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~".foreach(c => m(c) = true)
    m
  }

  def kernel(text: UTF8String): ArrayData = {
    val raw = text.toString
    // one pass over the raw string: punct + non-whitespace codepoints
    var punct = 0L
    var wordchars = 0L
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      if (cp < 128 && punctMask(cp)) punct += 1
      if (!(cp < 128 && isWs(cp.toChar))) wordchars += 1
      i += Character.charCount(cp)
    }
    // n_tokens over the space-trimmed ORIGINAL (tokenCount contract)
    val trimmed = text.trim.toString
    val nTokens = if (trimmed.isEmpty) 0L else splitCount(trimmed)
    // stopword hits over the space-trimmed LOWERCASED text: walk
    // maximal non-\s runs (empty tokens never match a stopword)
    val lower = text.toLowerCase.trim.toString
    var stop = 0L
    var start = 0
    var j = 0
    while (j <= lower.length) {
      if (j == lower.length || isWs(lower.charAt(j))) {
        if (j > start && stopwords.contains(lower.substring(start, j))) stop += 1
        start = j + 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(nTokens, punct, stop, wordchars))
  }
}
