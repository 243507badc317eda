package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge

/** The library's native Catalyst expressions as plain Spark SQL
  * functions, so `spark.sql("SELECT graft_simhash(text) ...")` works
  * without touching the Column API — the standard extension-library
  * surface (`spark.sql.extensions=graft.GraftExtensions`, or
  * [[GraftFunctions.register]] on a running session).
  *
  * Optional parameters default to the operator-layer defaults
  * (`operators.Dedup` / `SimilaritySearch` / `TextAnalysis`), so the SQL
  * spelling of a pipeline stage is bit-identical to the DataFrame one.
  */
object GraftFunctions {

  private def litLong(fname: String, arg: String, e: Expression): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fname: $arg must be an integer literal, got $other")
  }
  private def litInt(fname: String, arg: String, e: Expression): Int =
    litLong(fname, arg, e).toInt

  private def litDouble(fname: String, arg: String, e: Expression): Double = e match {
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fname: $arg must be a numeric literal, got $other")
  }

  /** The [[graft.operators.Sampling.hash63]] tree from raw resolved
    * Catalyst nodes (a registry builder cannot return the Column
    * bridge's unresolved nodes — see graft_url_domain). */
  private def hash63Expr(key: Expression, seed: Long): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseXor, Cast, ShiftRightUnsigned}
    ShiftRightUnsigned(
      Mix64(BitwiseXor(Cast(key, org.apache.spark.sql.types.LongType),
        Literal(seed))),
      Literal(1))
  }

  private def badArity(fname: String, got: Int, want: String): Nothing =
    throw new IllegalArgumentException(
      s"$fname takes $want argument(s), got $got")

  /** (name, usage, builder) for every exposed expression. */
  val registry: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_language_id", "(text) - marker-lexicon language id",
      {
        case Seq(t) => LanguageIdExpr(t)
        case as => badArity("graft_language_id", as.length, "1")
      }),
    ("graft_quality_stats",
      "(text) - [n_tokens, n_punct, n_stop, n_wordchars] in one pass",
      {
        case Seq(t) => QualityStats(t)
        case as => badArity("graft_quality_stats", as.length, "1")
      }),
    ("graft_gopher_stats",
      "(text) - the nine Gopher-rule counting stats in one pass",
      {
        case Seq(t) => GopherStats(t)
        case as => badArity("graft_gopher_stats", as.length, "1")
      }),
    ("graft_gopher_repetition",
      "(text) - the 13 Gopher repetition-filter fractions in one pass",
      {
        case Seq(t) => GopherRepetition(t)
        case as => badArity("graft_gopher_repetition", as.length, "1")
      }),
    ("graft_subword_count",
      "(text) - BPE-ish subword piece count (alnum runs + non-space symbols)",
      {
        case Seq(t) => SubwordCountExpr(t)
        case as => badArity("graft_subword_count", as.length, "1")
      }),
    ("graft_simhash", "(text[, seed]) - 64-bit SimHash of the token stream",
      {
        case Seq(t) => SimHash64(t, 42L)
        case Seq(t, s) => SimHash64(t, litLong("graft_simhash", "seed", s))
        case as => badArity("graft_simhash", as.length, "1 or 2")
      }),
    ("graft_minhash",
      "(text[, numHashes, shingleSize, seed]) - one-permutation MinHash signature",
      {
        case Seq(t) => MinHashSignature(t, 128, 3, 42L)
        case Seq(t, n, sh, s) => MinHashSignature(t,
          litInt("graft_minhash", "numHashes", n),
          litInt("graft_minhash", "shingleSize", sh),
          litLong("graft_minhash", "seed", s))
        case as => badArity("graft_minhash", as.length, "1 or 4")
      }),
    ("graft_winnow_fingerprint",
      "(text[, k, window]) - winnowing document fingerprint (MOSS)",
      {
        case Seq(t) => WinnowFingerprint(t, 8, 16)
        case Seq(t, k, w) => WinnowFingerprint(t,
          litInt("graft_winnow_fingerprint", "k", k),
          litInt("graft_winnow_fingerprint", "window", w))
        case as => badArity("graft_winnow_fingerprint", as.length, "1 or 3")
      }),
    ("graft_ngram_hashes",
      "(text[, n]) - distinct hashed word n-gram shingle set",
      {
        case Seq(t) => NgramHashSet(t, 3)
        case Seq(t, n) => NgramHashSet(t, litInt("graft_ngram_hashes", "n", n))
        case as => badArity("graft_ngram_hashes", as.length, "1 or 2")
      }),
    ("graft_cosine", "(vec, vec) - fused cosine similarity of float vectors",
      {
        case Seq(a, b) => CosineSimilarity(a, b)
        case as => badArity("graft_cosine", as.length, "2")
      }),
    ("graft_signature_agreement",
      "(sig, sig) - agreeing positions of two MinHash signatures",
      {
        case Seq(a, b) => SignatureAgreement(a, b)
        case as => badArity("graft_signature_agreement", as.length, "2")
      }),
    ("graft_hyperplane_sig",
      "(vec[, seed]) - 64-bit random-hyperplane signature of a float vector",
      {
        case Seq(v) => HyperplaneSignature64(v, 42L)
        case Seq(v, s) => HyperplaneSignature64(v,
          litLong("graft_hyperplane_sig", "seed", s))
        case as => badArity("graft_hyperplane_sig", as.length, "1 or 2")
      }),
    ("graft_band_bucket_hash",
      "(band, sigSlice) - fixed-width LSH band bucket key",
      {
        case Seq(b, s) => BandBucketHash(b, s)
        case as => badArity("graft_band_bucket_hash", as.length, "2")
      }),
    ("graft_hyperplane_sigs",
      "(vec, seed, bits) - multi-limb random-hyperplane signature (bits = multiple of 64)",
      {
        case Seq(v, s, b) => HyperplaneSignatures(v,
          litLong("graft_hyperplane_sigs", "seed", s),
          litInt("graft_hyperplane_sigs", "bits", b))
        case as => badArity("graft_hyperplane_sigs", as.length, "3")
      }),
    ("graft_winnow_prints",
      "(text[, k, window]) - distinct position-independent winnowing print set",
      {
        case Seq(t) => WinnowPrintSet(t, 8, 16)
        case Seq(t, k, w) => WinnowPrintSet(t,
          litInt("graft_winnow_prints", "k", k),
          litInt("graft_winnow_prints", "window", w))
        case as => badArity("graft_winnow_prints", as.length, "1 or 3")
      }),
    ("graft_mix64",
      "(key) - SplitMix64 finalizer; the deterministic split/sample hash",
      {
        case Seq(k) => Mix64(k)
        case as => badArity("graft_mix64", as.length, "1")
      }),
    ("graft_fold",
      "(key, seed, folds) - deterministic fold in [0, folds): the train/val/test primitive",
      {
        case Seq(k, s, f) =>
          import org.apache.spark.sql.catalyst.expressions.Pmod
          val folds = litLong("graft_fold", "folds", f)
          if (folds <= 0) throw new IllegalArgumentException(
            "graft_fold: folds must be positive")
          Pmod(hash63Expr(k, litLong("graft_fold", "seed", s)), Literal(folds))
        case as => badArity("graft_fold", as.length, "3")
      }),
    ("graft_split",
      "(key, seed, w1, w2, ...) - 0-based weighted split index (e.g. 8,1,1 = 80/10/10 train/val/test)",
      {
        // same boundary derivation as Sampling.splitByWeights
        // (Sampling.splitBounds), spec-pinned bit-equal
        case as if as.length >= 3 =>
          import org.apache.spark.sql.catalyst.expressions.{CaseWhen, LessThan}
          val ws = as.drop(2).zipWithIndex.map { case (e, i) =>
            val w = litDouble("graft_split", s"w${i + 1}", e)
            if (w <= 0 || w.isInfinite || w.isNaN)
              throw new IllegalArgumentException(
                s"graft_split: weights must be positive and finite, got $w")
            w
          }
          val u = hash63Expr(as.head, litLong("graft_split", "seed", as(1)))
          val branches = graft.operators.Sampling.splitBounds(ws).zipWithIndex
            .map { case (b, i) => (LessThan(u, Literal(b)), Literal(i)) }
          if (branches.isEmpty) Literal(0)
          else CaseWhen(branches, Some(Literal(ws.length - 1)))
        case as => badArity("graft_split", as.length, "at least 3")
      }),
    ("graft_html_to_text",
      "(html) - deterministic HTML -> text extraction (strip chain, entity decode, whitespace collapse)",
      {
        // raw-node restatement of TextAnalysis.htmlToText (registry
        // builders must return resolved trees); GraftExtensionsSpec
        // pins bit-equality with the Column form
        case Seq(h) =>
          import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringReplace, StringTrim}
          def re(c: Expression, pat: String, rep: String): Expression =
            RegExpReplace(c, Literal(pat), Literal(rep))
          def rep(c: Expression, from: String, to: String): Expression =
            StringReplace(c, Literal(from), Literal(to))
          val noScript = re(h, "(?is)<script\\b[^>]*>.*?</script>", " ")
          val noStyle = re(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
          val noComment = re(noStyle, "(?s)<!--.*?-->", " ")
          val noCdata = re(noComment, "(?s)<!\\[CDATA\\[.*?\\]\\]>", " ")
          val noTags = re(noCdata, "<[^>]*>", " ")
          val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
            "&apos;" -> "'", "&#39;" -> "'", "&nbsp;" -> " ")
            .foldLeft(noTags) { case (c, (f, t)) => rep(c, f, t) }
          StringTrim(re(rep(ent, "&amp;", "&"), "\\s+", " "))
        case as => badArity("graft_html_to_text", as.length, "1")
      }),
    ("graft_pii_scan",
      "(text) - struct(n_emails, n_phones, n_ipv4, redacted): PII counts + redacted text",
      {
        case Seq(t) => PiiScan(t)
        case as => badArity("graft_pii_scan", as.length, "1")
      }),
    ("graft_repetition_stats",
      "(text) - [top_unigram_frac, dup_bigram_frac] repetition quality signals",
      {
        case Seq(t) => RepetitionStats(t)
        case as => badArity("graft_repetition_stats", as.length, "1")
      }),
    ("graft_canonical_url",
      "(url) - canonical URL: scheme/host lowercased, fragment dropped, tracking params removed, params sorted",
      {
        // raw-node restatement of TextAnalysis.canonicalUrl (registry
        // builders must return RESOLVED trees — the param filter lambda
        // is built on a NamedLambdaVariable directly, the resolved
        // form); GraftExtensionsSpec pins bit-equality with the Column
        // form over the adversarial battery
        case Seq(u) =>
          import org.apache.spark.sql.catalyst.expressions.{And, ArrayFilter, ArrayJoin, Concat, GreaterThan, If, LambdaFunction, Length, Literal => L, Lower, NamedLambdaVariable, Not, RegExpExtract, RLike, Size, SortArray, StringSplit}
          import org.apache.spark.sql.types.{ArrayType, StringType}
          def rex(src: Expression, pat: String, group: Int): Expression =
            RegExpExtract(src, L(pat), L(group))
          val scheme = Lower(rex(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
          val host = Lower(rex(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
          val path = rex(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
          val query = rex(u, "^[^?#]*\\?([^#]*)", 1)
          val params = If(GreaterThan(Length(query), L(0)),
            StringSplit(query, L("&"), L(-1)),
            L.create(Seq.empty[String], ArrayType(StringType)))
          val p = NamedLambdaVariable("p", StringType, nullable = true)
          val keep = LambdaFunction(
            And(GreaterThan(Length(p), L(0)),
              Not(RLike(p, L(graft.operators.TextAnalysis.TrackingParamPattern)))),
            Seq(p))
          val kept = ArrayFilter(params, keep)
          // no scheme://host shape → NULL, never a "://" fragment
          If(And(GreaterThan(Length(scheme), L(0)),
              GreaterThan(Length(host), L(0))),
            Concat(Seq(scheme, L("://"), host, path,
              If(GreaterThan(Size(kept), L(0)),
                Concat(Seq(L("?"), ArrayJoin(SortArray(kept, L(true)), L("&"), None))),
                L("")))),
            L.create(null, StringType))
        case as => badArity("graft_canonical_url", as.length, "1")
      }),
    ("graft_url_domain",
      "(text) - host of the first http(s) URL in text, NULL if none",
      {
        // built from raw catalyst nodes: a registry builder must return
        // a RESOLVED expression tree (the Column-API bridge yields an
        // unresolved ColumnNodeExpression here); GraftExtensionsSpec
        // pins bit-equality with TextAnalysis.urlDomain
        case Seq(t) =>
          import org.apache.spark.sql.catalyst.expressions.{GreaterThan, If, Length, RegExpExtract}
          val url = RegExpExtract(t,
            Literal(graft.operators.TextAnalysis.UrlPattern), Literal(0))
          If(GreaterThan(Length(url), Literal(0)),
            RegExpExtract(url, Literal("https?://([^/]+)"), Literal(1)),
            Literal(null, org.apache.spark.sql.types.StringType))
        case as => badArity("graft_url_domain", as.length, "1")
      }),
    ("graft_nfc_normalize",
      "(text) - Unicode NFC canonical composition (the pre-tokenization normalization floor)",
      {
        case Seq(t) => NfcNormalize(t)
        case as => badArity("graft_nfc_normalize", as.length, "1")
      }),
    ("graft_nfkc_normalize",
      "(text) - Unicode NFKC compatibility composition (ligature/width/super-script folds, the tokenizer-trainer default)",
      {
        case Seq(t) => NfkcNormalize(t)
        case as => badArity("graft_nfkc_normalize", as.length, "1")
      }),
    ("graft_hll_reg_rho",
      "(key, p) - packed HyperLogLog register observation (reg << 8 | rho) at precision p",
      {
        case Seq(k, p) => HllRegRho(k, litInt("graft_hll_reg_rho", "p", p))
        case as => badArity("graft_hll_reg_rho", as.length, "2")
      }),
    ("graft_ac_count",
      "(text, pattern1, ...) - [total_matches, distinct_patterns] Aho-Corasick blocklist counts",
      {
        case as if as.length >= 2 =>
          val pats = as.tail.zipWithIndex.map {
            case (Literal(s: org.apache.spark.unsafe.types.UTF8String, _), _)
              if s != null => s.toString
            case (other, i) => throw new IllegalArgumentException(
              s"graft_ac_count: pattern${i + 1} must be a string literal, got $other")
          }
          AcScan(as.head, pats)
        case as => badArity("graft_ac_count", as.length, "at least 2")
      }))

  private[graft] def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, null, name,
      usage, "")

  /** Register every function on an already-running session. */
  def register(spark: SparkSession): Unit =
    registry.foreach { case (name, usage, builder) =>
      ColumnBridge.registerFunction(spark, FunctionIdentifier(name),
        info(name, usage), builder)
    }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftFunctions.info(name, usage), builder))
    }
}
