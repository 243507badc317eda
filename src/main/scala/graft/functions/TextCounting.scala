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

/** The FULL Gopher repetition-filter battery (Rae et al. 2021,
  * Table A1 — the within-document excessive-repetition signals
  * Gopher/RefinedWeb/Dolma-class pipelines gate on, beyond the two
  * cheap ones in [[RepetitionStats]]) as ONE row-local native
  * expression returning `array<double>` of 13 fractions:
  *
  *  - [0] dup_line_frac, [1] dup_line_char_frac — over the literal
  *    '\n' split of the RAW text, non-empty pieces only, duplicate =
  *    every occurrence of a content beyond its first
  *    (Σ(c−1)/Σc and Σ((c−1)·len)/Σ(c·len), codepoint lengths);
  *  - [2] dup_para_frac, [3] dup_para_char_frac — same formulas over
  *    the non-overlapping left-to-right literal "\n\n" split
  *    (string_split semantics: a separator run of 2k newlines yields
  *    k−1 empty pieces, which the non-empty filter drops);
  *  - [4..6] top_{2,3,4}gram_char_frac — tokens are the maximal
  *    non-\s runs of lower(text) (NO trim, no phantom empty tokens;
  *    the oracle restates `list_filter(string_split_regex(lower(t),
  *    '\s+'), x -> x <> '')`); the most frequent n-gram is chosen by
  *    (count DESC, gram ASC in CODEPOINT order — DuckDB's binary
  *    collation, not Java UTF-16 order); fraction = count · Σ(token
  *    codepoint lens of that gram) / Σ(all token codepoint lens);
  *  - [7..12] dup_{5..10}gram_char_frac — fraction of token
  *    codepoints lying inside ANY window whose n-gram occurs ≥ 2
  *    times in the document (overlapping windows mark a position
  *    once — the standard "characters in duplicated n-grams"
  *    definition).
  *
  * Fewer than n tokens (or no lines/paragraphs) ⇒ that fraction is
  * 0.0; a token-less document returns all zeros, NULL text returns
  * NULL. All sums are exact longs with ONE final double division, so
  * the DuckDB oracle's restatement is bit-identical. Like the other
  * counting kernels, the Java-\s vs RE2-\s vertical-tab divergence and
  * the JDK-vs-DuckDB lowercase divergence on exotic case mappings
  * (Turkish İ, ß) are out of corpus by the p41/p32 convention. */
case class GopherRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gopher_repetition"

  override protected def nullSafeEval(v: Any): Any =
    GopherRepetition.kernel(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.GopherRepetition.kernel($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepetition {

  def apply(text: Column): Column =
    ColumnBridge.column(GopherRepetition(ColumnBridge.expression(text)))

  import TextKernelUtil.isWs

  /** Σ(c−1)/Σc and Σ((c−1)·len)/Σ(c·len) over the non-empty pieces'
    * content counts; writes the two fractions at out(at), out(at+1). */
  private def dupPieceFracs(pieces: java.util.ArrayList[String],
      out: Array[Double], at: Int): Unit = {
    if (pieces.isEmpty) return
    val counts = new java.util.HashMap[String, Int](pieces.size * 2)
    var i = 0
    while (i < pieces.size) {
      counts.merge(pieces.get(i), 1, Integer.sum)
      i += 1
    }
    var total = 0L
    var dup = 0L
    var totalCh = 0L
    var dupCh = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.toLong
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      total += c
      dup += c - 1
      totalCh += c * len
      dupCh += (c - 1) * len
    }
    out(at) = dup.toDouble / total.toDouble
    if (totalCh > 0) out(at + 1) = dupCh.toDouble / totalCh.toDouble
  }

  def kernel(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val raw = text.toString
    val out = new Array[Double](13)

    // lines: literal '\n' split of the RAW text, non-empty pieces
    val lines = new java.util.ArrayList[String]()
    var start = 0
    var idx = raw.indexOf('\n')
    while (idx >= 0) {
      if (idx > start) lines.add(raw.substring(start, idx))
      start = idx + 1
      idx = raw.indexOf('\n', start)
    }
    if (start < raw.length) lines.add(raw.substring(start))
    dupPieceFracs(lines, out, 0)

    // paragraphs: non-overlapping left-to-right "\n\n" split
    val paras = new java.util.ArrayList[String]()
    start = 0
    idx = raw.indexOf("\n\n")
    while (idx >= 0) {
      if (idx > start) paras.add(raw.substring(start, idx))
      start = idx + 2
      idx = raw.indexOf("\n\n", start)
    }
    if (start < raw.length) paras.add(raw.substring(start))
    dupPieceFracs(paras, out, 2)

    // tokens: maximal non-\s runs of lower(text)
    val lower = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < lower.length) {
      while (i < lower.length && isWs(lower.charAt(i))) i += 1
      if (i < lower.length) {
        val s0 = i
        while (i < lower.length && !isWs(lower.charAt(i))) i += 1
        toks.add(lower.substring(s0, i))
      }
    }
    val nTok = toks.size
    if (nTok == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    val lens = new Array[Long](nTok)
    var totalCh = 0L
    i = 0
    while (i < nTok) {
      val t = toks.get(i)
      lens(i) = t.codePointCount(0, t.length).toLong
      totalCh += lens(i)
      i += 1
    }

    // Intern tokens to dense ids once; all nine n-gram passes then sort
    // id-sequence WINDOWS and count adjacent equal runs — no gram
    // strings, no per-n hash maps (the string-built form measured
    // 2.3 ms/doc at the 100x probe; this one retires the allocation).
    // Id-sequence equality IS gram equality: tokens are non-empty and
    // whitespace-free, so the space-joined form is uniquely decodable.
    val ids = new Array[Int](nTok)
    locally {
      val intern = new java.util.HashMap[String, Integer](nTok * 2)
      i = 0
      while (i < nTok) {
        val t = toks.get(i)
        var id = intern.get(t)
        if (id == null) { id = Integer.valueOf(intern.size); intern.put(t, id) }
        ids(i) = id.intValue
        i += 1
      }
    }

    // any consistent order groups equal windows adjacently
    def seqCompare(a: Int, b: Int, n: Int): Int = {
      var k = 0
      while (k < n) {
        val d = ids(a + k) - ids(b + k)
        if (d != 0) return d
        k += 1
      }
      0
    }

    // next codepoint of window w's space-joined form; cur = [tokenIdx,
    // charIdx]; returns -1 at end. Tokens CAN hold codepoints below
    // U+0020 (non-\s controls), so joined order differs from token-wise
    // order — the oracle's `ORDER BY g ASC` binary collation needs the
    // literal joined walk.
    def nextCp(w: Int, n: Int, cur: Array[Int]): Int = {
      while (cur(0) < n) {
        val t = toks.get(w + cur(0))
        if (cur(1) < t.length) {
          val cp = t.codePointAt(cur(1))
          cur(1) += Character.charCount(cp)
          return cp
        }
        cur(0) += 1
        cur(1) = 0
        if (cur(0) < n) return 32
      }
      -1
    }

    // codepoint compare of the space-joined windows; tie-breaks only
    def joinedCompare(a: Int, b: Int, n: Int): Int = {
      val ca = Array(0, 0)
      val cb = Array(0, 0)
      var d = 0
      var x = 0
      while (d == 0 && x != -1) {
        x = nextCp(a, n, ca)
        val y = nextCp(b, n, cb)
        d = x - y
      }
      d
    }

    var n = 2
    while (n <= 10) {
      if (nTok >= n) {
        val nW = nTok - n + 1
        val order = new Array[Integer](nW)
        i = 0
        while (i < nW) { order(i) = Integer.valueOf(i); i += 1 }
        val nn = n
        java.util.Arrays.sort(order, new java.util.Comparator[Integer] {
          override def compare(x: Integer, y: Integer): Int = {
            val d = seqCompare(x.intValue, y.intValue, nn)
            if (d != 0) d else x.intValue - y.intValue
          }
        })
        if (n <= 4) {
          // top gram: longest run; count ties break to the joined form
          // lowest in codepoint order (the oracle's g ASC)
          var bestC = 0
          var bestW = -1
          var s = 0
          while (s < nW) {
            var e = s + 1
            while (e < nW && seqCompare(order(s).intValue, order(e).intValue, n) == 0) e += 1
            val c = e - s
            if (c > bestC ||
              (c == bestC && joinedCompare(order(s).intValue, bestW, n) < 0)) {
              bestC = c
              bestW = order(s).intValue
            }
            s = e
          }
          var gramCh = 0L
          var k = 0
          while (k < n) { gramCh += lens(bestW + k); k += 1 }
          out(2 + n) = (bestC.toLong * gramCh).toDouble / totalCh.toDouble
        } else {
          // dup grams: codepoints inside any window of a run of >= 2,
          // positions marked once
          val covered = new Array[Boolean](nTok)
          var s = 0
          while (s < nW) {
            var e = s + 1
            while (e < nW && seqCompare(order(s).intValue, order(e).intValue, n) == 0) e += 1
            if (e - s >= 2) {
              var q = s
              while (q < e) {
                val w = order(q).intValue
                var k = w
                while (k < w + n) { covered(k) = true; k += 1 }
                q += 1
              }
            }
            s = e
          }
          var dupCh = 0L
          i = 0
          while (i < nTok) {
            if (covered(i)) dupCh += lens(i)
            i += 1
          }
          out(2 + n) = dupCh.toDouble / totalCh.toDouble
        }
      }
      n += 1
    }

    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
