package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Marker-lexicon language ID (reference: an LLM-pipeline text-analysis
  * operator, not a bayeslite feature) as ONE native expression.
  *
  * Replaces the composed form `split(trim(lower(text)), "\\s+")` feeding
  * five `filter(tokens, _.isin(markers))` scores and an
  * `array_max(array(struct(score, lang)...))` tie-break: Catalyst's
  * higher-order functions are CodegenFallback (interpreted lambdas, one
  * pass per language), so the hot path materialized a token ArrayData and
  * re-walked it five times per row. This kernel makes one pass over the
  * tokens with a token→language-bitmask map and stays inside whole-stage
  * codegen.
  *
  * Bit-exact with the composed form it replaced (pinned by PipelineSpec
  * "fused language-ID expression matches the composed-operator form"):
  *  - lower/trim/split reproduce Spark's semantics exactly —
  *    UTF8String.toLowerCase, UTF8String.trim (ASCII space only, NOT
  *    Java String.trim), and regex split with limit -1 (leading/trailing
  *    empty tokens kept, as Spark's `split` keeps them);
  *  - score = marker hits / max(1, tokens); ties break like the struct
  *    array_max (score first, then lexicographically LARGEST lang);
  *  - any Han-script character in the raw text is decisive for "zh";
  *  - no hits → "und".
  * The raw expression is null-intolerant (NULL in → NULL out); the
  * [[graft.operators.TextAnalysis.languageId]] wrapper coalesces NULL
  * text to blank first, so the pipeline surface matches the composed
  * form's 'und' fall-through (NULL ≡ blank contract).
  */
case class LanguageIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_language_id"

  override protected def nullSafeEval(v: Any): Any =
    LanguageIdExpr.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LanguageIdExpr.kernel($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LanguageIdExpr {

  /** Per-language marker lexicons. Tiny on purpose; shared with the p10
    * and st01 DuckDB oracles so both engines score the same lexicons. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "this"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "que", "une"),
    "es" -> Seq("el", "los", "las", "es", "con", "que", "una", "para"),
    "zh" -> Seq("de", "shi", "zai", "le", "he", "you", "wo", "ta"))

  private val langs: Array[String] = Markers.map(_._1).toArray

  /** token → bitmask of languages whose marker set contains it (a token
    * like "le" hits both fr and zh). */
  private val tokenMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for ((lang, ms) <- Markers; t <- ms) {
      val l = langs.indexOf(lang)
      val prev = m.get(t)
      m.put(t, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << l)))
    }
    m
  }

  def kernel(text: UTF8String): UTF8String = {
    val raw = text.toString
    // Han script is decisive (the composed form's regexp_replace probe)
    var i = 0
    val len = raw.length
    while (i < len) {
      val cp = raw.codePointAt(i)
      if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN)
        return UTF8String.fromString("zh")
      i += Character.charCount(cp)
    }
    // Spark-exact tokenization: UTF8String lower + space-only trim, then
    // regex split keeping empty tokens (limit -1)
    val tokens = text.toLowerCase.trim.toString.split("\\s+", -1)
    val n = math.max(tokens.length, 1).toDouble
    val counts = new Array[Int](langs.length)
    var t = 0
    while (t < tokens.length) {
      val m = tokenMask.get(tokens(t))
      if (m != null) {
        var mask = m.intValue()
        var l = 0
        while (mask != 0) {
          if ((mask & 1) == 1) counts(l) += 1
          mask >>>= 1
          l += 1
        }
      }
      t += 1
    }
    // argmax with the struct-array_max tie-break: score, then the
    // lexicographically larger lang code
    var bestScore = -1.0
    var bestLang: String = null
    var l = 0
    while (l < langs.length) {
      val s = counts(l) / n
      if (s > bestScore || (s == bestScore && langs(l).compareTo(bestLang) > 0)) {
        bestScore = s
        bestLang = langs(l)
      }
      l += 1
    }
    UTF8String.fromString(if (bestScore > 0.0) bestLang else "und")
  }

  def apply(text: Column): Column =
    ColumnBridge.column(LanguageIdExpr(ColumnBridge.expression(text)))
}
