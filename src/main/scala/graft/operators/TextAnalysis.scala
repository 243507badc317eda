package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (engine
  * extensions; BASELINE.json north star): token counting, quality
  * scoring, language identification, document fingerprinting.
  *
  * Everything except the fingerprint/lang-id UDFs is pure native
  * expressions — whole-stage codegen, filters/projections push to the
  * scan, no shuffle at all (row-local transforms).
  */
object TextAnalysis {

  /** Whitespace token count; 0 for empty/blank. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation
    * as separate tokens (a cheap, deterministic stand-in for a real BPE
    * vocabulary; same plan shape). */
  def subwordCount(text: Column): Column =
    size(filter(
      split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  private val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "it", "that", "this", "with", "for", "on", "as", "at")

  /** Quality metrics: length, tokens, punctuation ratio, stopword ratio,
    * mean word length, and a composite [0,1] score (monotone in
    * stopword presence and sane word lengths — the standard cheap
    * heuristics, cf. Gopher/C4-style quality rules). */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = split(trim(lower(t)), "\\s+")
    val nTokens = tokenCount(t)
    val nChars = length(t)
    val punct = nChars - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stop = size(filter(tokens, w => w.isin(Stopwords: _*)))
    df
      .withColumn("n_chars_m", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("punct_ratio",
        when(nChars === 0, 0.0).otherwise(punct.cast("double") / nChars))
      .withColumn("stopword_ratio",
        when(nTokens === 0, 0.0).otherwise(stop.cast("double") / nTokens))
      .withColumn("mean_word_len",
        when(nTokens === 0, 0.0)
          .otherwise((length(regexp_replace(trim(t), "\\s+", "")).cast("double")) / nTokens))
      .withColumn("quality_score",
        round(greatest(lit(0.0), least(lit(1.0),
          lit(0.5)
            + lit(0.5) * least(col("stopword_ratio") * 2.5, lit(1.0))
            - lit(0.5) * col("punct_ratio")
            - when(col("mean_word_len") < 2.0 || col("mean_word_len") > 12.0, 0.25)
              .otherwise(0.0))), 6))
  }

  /** Per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose. Shared with the p10/st01 DuckDB oracles
    * so both engines score the same lexicons (canonical copy lives with
    * the fused expression). */
  private[graft] val LangMarkers: Seq[(String, Seq[String])] =
    graft.functions.LanguageIdExpr.Markers

  /** Language ID: score = fraction of tokens hitting each language's
    * marker set (+ a decisive Han-script probe for zh); argmax wins,
    * 'und' when nothing matches. One codegen'd pass
    * ([[graft.functions.LanguageIdExpr]]) — the previous composed form
    * ran five interpreted ArrayFilter lambdas per row. */
  def languageId(text: Column): Column =
    graft.functions.LanguageIdExpr(text)

  /** The composed higher-order-function form [[languageId]] replaced,
    * kept as the independent semantics pin for the parity spec (and the
    * template the DuckDB oracles mirror). */
  private[graft] def composedLanguageId(text: Column): Column = {
    val tokens = split(trim(lower(text)), "\\s+")
    val n = greatest(size(tokens), lit(1)).cast("double")
    val scores = LangMarkers.map { case (lang, markers) =>
      val hits = size(filter(tokens, w => w.isin(markers: _*))).cast("double") / n
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    // CJK characters are decisive for zh
    val cjk = length(regexp_replace(text, "[^\\p{IsHan}]", "")) > 0
    val best = array_max(array(scores: _*))
    when(cjk, lit("zh"))
      .when(best.getField("score") > 0.0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** 64-bit content fingerprint by winnowing (Schleimer et al., MOSS):
    * rolling Rabin–Karp hashes of char k-grams, minimum per window,
    * fingerprint = combined distinct window minima. Row-local, native
    * Catalyst expression ([[graft.functions.WinnowFingerprint]]). */
  def fingerprint(k: Int = 8, window: Int = 16): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    text => graft.functions.WinnowFingerprint(text, k, window)
}
