package graft.functions

import graft.operators.DetRngHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-permutation MinHash signature of a text column as a native
  * Catalyst expression (kernel as in the UDF it replaced, bit-identical:
  * fused text→token-hash→window-FNV pass, per-bin minima, rotational
  * densification; see Dedup's scaladoc for the algorithm discussion).
  * Native wins over the ScalaUDF: no encoder conversion wrappers, the
  * primitive long[] result goes straight to UnsafeArrayData, and the
  * call stays inside whole-stage codegen. NULL for NULL text or fewer
  * tokens than the shingle size. */
case class MinHashSignature(child: Expression, numHashes: Int,
    shingleSize: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(v: Any): Any = {
    val sig = MinHashSignature.kernel(
      v.asInstanceOf[UTF8String].toString, numHashes, shingleSize, seed)
    if (sig == null) null else UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sig")
      s"""
         |long[] $r = graft.functions.MinHashSignature.kernel(
         |  $v.toString(), $numHashes, $shingleSize, ${seed}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** The fused signature kernel (verbatim from the UDF form). */
  def kernel(text: String, numHashes: Int, shingleSize: Int, seed: Long): Array[Long] = {
    val tokens = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val windows = tokens.length - (shingleSize - 1)
    if (windows <= 0 || (tokens.length == 1 && tokens(0).isEmpty)) null
    else {
      val tokenHash = new Array[Long](tokens.length)
      var i = 0
      while (i < tokens.length) {
        tokenHash(i) = DetRngHash.xx(tokens(i).getBytes("UTF-8"))
        i += 1
      }
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val mixedSeed = DetRngHash.mix(seed)
      var w = 0
      while (w < windows) {
        // FNV-combine the window's token hashes (order-sensitive)
        var h0 = 0xcbf29ce484222325L
        var k = 0
        while (k < shingleSize) {
          h0 = (h0 ^ tokenHash(w + k)) * 0x100000001b3L
          k += 1
        }
        val h = DetRngHash.mix(DetRngHash.mix(h0) ^ mixedSeed)
        val bin = ((h >>> 1) % numHashes).toInt
        val v = DetRngHash.mix(h ^ 0x9e3779b97f4a7c15L)
        if (v < sig(bin)) sig(bin) = v
        w += 1
      }
      // densify: empty bins copy the next non-empty bin (circular)
      var anyFilled = false
      i = 0
      while (i < numHashes && !anyFilled) {
        if (sig(i) != Long.MaxValue) anyFilled = true
        i += 1
      }
      if (!anyFilled) null
      else {
        // right-to-left so a whole empty run fills from its right
        // neighbor in one pass; the wrap-around search covers runs
        // crossing the top end
        var j = numHashes - 1
        while (j >= 0) {
          if (sig(j) == Long.MaxValue) {
            var k2 = (j + 1) % numHashes
            while (sig(k2) == Long.MaxValue) k2 = (k2 + 1) % numHashes
            sig(j) = sig(k2)
          }
          j -= 1
        }
        sig
      }
    }
  }

  def apply(text: Column, numHashes: Int, shingleSize: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(text), numHashes, shingleSize, seed))
}

/** Fixed-width LSH bucket key: FNV-1a 64 fold of a band index and its
  * signature slice values, splitmix64-finalized. Replaces the string
  * bucket key (`"band:v1,v2,..."`, 40–80 bytes) the streaming near-dup
  * state used to carry — at 100-TB-class state cardinality the 12-byte
  * (band, hash) struct key cuts the state store's key footprint ~5×
  * and keeps comparisons branchless. Collision risk over a 2^64 space
  * is negligible against LSH's own false-positive floor, and the fold
  * is reproduced bit-exactly in the DuckDB oracle (same FNV limb /
  * splitmix64 stage machinery as the p02/p03/p11 oracles). */
case class BandBucketHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (int, array<bigint>), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_band_bucket_hash"

  override protected def nullSafeEval(band: Any, slice: Any): Any =
    BandBucketHash.kernel(band.asInstanceOf[Int],
      slice.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.BandBucketHash.kernel($b, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BandBucketHash {

  def kernel(band: Int, slice: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var h = 0xcbf29ce484222325L
    h = (h ^ band.toLong) * 0x100000001b3L
    var i = 0
    val n = slice.numElements()
    while (i < n) {
      h = (h ^ slice.getLong(i)) * 0x100000001b3L
      i += 1
    }
    DetRngHash.mix(h)
  }

  def apply(band: Column, slice: Column): Column =
    ColumnBridge.column(BandBucketHash(
      ColumnBridge.expression(band), ColumnBridge.expression(slice)))
}

/** 64-bit SimHash of the whitespace token stream as a native expression
  * (bit-identical to the UDF it replaced). NULL for NULL text or an
  * empty token stream. */
case class SimHash64(child: Expression, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(v: Any): Any =
    SimHash64.kernel(v.asInstanceOf[UTF8String].toString, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sim")
      s"""
         |java.lang.Long $r = graft.functions.SimHash64.kernel($v.toString(), ${seed}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** nibble value → its 4 bits spread into 4 packed 16-bit lanes, so
    * one long add counts 4 bit-positions at once. */
  private val NibbleLanes: Array[Long] = Array.tabulate(16) { v =>
    var p = 0L
    var b = 0
    while (b < 4) { if (((v >> b) & 1) == 1) p |= 1L << (16 * b); b += 1 }
    p
  }

  def kernel(text: String, seed: Long): java.lang.Long = {
    val tokens = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    if (tokens.isEmpty) null
    else if (tokens.length >= 65536) kernelWide(tokens, seed)
    else {
      // ones-count per bit, 4 lanes of 16 bits per accumulator long:
      // 16 adds per token instead of the naive 64. ±1 voting with
      // "acc > 0" is equivalent to "2·ones > n" exactly. 16-bit lanes
      // carry into the neighbor at 65536 ones, so book-sized token
      // streams take the wide-counter path above.
      val acc = new Array[Long](16)
      var i = 0
      while (i < tokens.length) {
        val h = DetRngHash.mix(DetRngHash.xx(tokens(i).getBytes("UTF-8")) ^ seed)
        var g = 0
        while (g < 16) {
          acc(g) += NibbleLanes(((h >>> (4 * g)) & 0xfL).toInt)
          g += 1
        }
        i += 1
      }
      val n = tokens.length
      var out = 0L
      var b = 0
      while (b < 64) {
        val ones = (acc(b >> 2) >>> (16 * (b & 3))) & 0xffffL
        if (2 * ones > n) out |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(out)
    }
  }

  /** Overflow-proof variant for >=65536-token documents: one Int
    * ones-counter per bit position. Same votes, any input size. */
  private def kernelWide(tokens: Array[String], seed: Long): java.lang.Long = {
    val ones = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val h = DetRngHash.mix(DetRngHash.xx(tokens(i).getBytes("UTF-8")) ^ seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) ones(b) += 1
        b += 1
      }
      i += 1
    }
    val n = tokens.length.toLong
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) > n) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  def apply(text: Column, seed: Long): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text), seed))
}

/** 64-bit winnowing fingerprint (Schleimer et al., MOSS) as a native
  * expression — rolling Rabin–Karp char k-gram hashes, window minima
  * XOR-combined. Bit-identical to the UDF it replaced. NULL for NULL
  * or shorter-than-k text. */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_fp"

  override protected def nullSafeEval(v: Any): Any =
    WinnowFingerprint.kernel(v.asInstanceOf[UTF8String].toString, k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("fp")
      s"""
         |java.lang.Long $r = graft.functions.WinnowFingerprint.kernel(
         |  $v.toString(), $k, $window);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Finalized rolling Rabin–Karp k-gram hashes of the lowercased text —
    * the shared front half of both winnowing kernels (null for
    * shorter-than-k text). */
  private[functions] def gramHashes(text: String, k: Int): Array[Long] = {
    if (text.length < k) return null
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val B = 257L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hashes(0) = DetRngHash.mix(h)
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hashes(i) = DetRngHash.mix(h)
      i += 1
    }
    hashes
  }

  def kernel(text: String, k: Int, window: Int): java.lang.Long = {
    val hashes = gramHashes(text, k)
    if (hashes == null) return null
    val n = hashes.length
    // winnow: combine the minimum of each TUMBLING window of k-gram
    // hashes (position-mixed — a whole-document identity fingerprint,
    // not a containment-matching print set; see WinnowPrintSet)
    var out = 0L
    var w = 0
    while (w < n) {
      var m = Long.MaxValue
      var j = w
      val end = math.min(w + window, n)
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out ^= DetRngHash.mix(m + w)
      w += window
    }
    java.lang.Long.valueOf(out)
  }

  def apply(text: Column, k: Int, window: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(text), k, window))
}

/** The winnowing fingerprint SET (distinct sorted window minima,
  * position-INDEPENDENT) as a native expression — the
  * containment-matching form of [[WinnowFingerprint]]. The scalar
  * fingerprint mixes each window minimum with its window position
  * before combining (right for whole-document identity, but the same
  * shared substring at different offsets in two documents would never
  * match); this form keeps the raw finalized k-gram minima, so a
  * benchmark passage embedded anywhere in a training document shares
  * prints with the benchmark's own set — the decontamination primitive.
  * NULL for NULL or shorter-than-k text. */
case class WinnowPrintSet(child: Expression, k: Int, window: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow_prints"

  override protected def nullSafeEval(v: Any): Any =
    WinnowPrintSet.kernel(v.asInstanceOf[UTF8String].toString, k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("prints")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.WinnowPrintSet.kernel($v.toString(), $k, $window);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPrintSet {

  /** Distinct sorted minima of every SLIDING window of `window`
    * consecutive k-gram hashes — true Schleimer-et-al. winnowing, which
    * is what makes the containment guarantee hold: any window of
    * `window` consecutive grams fully inside a shared substring has
    * identical contents in both documents, so its minimum is selected
    * as a print in BOTH — tumbling blocks (the scalar fingerprint's
    * combine) realign with the embedding offset and a straddling
    * block's minimum can come from foreign grams, silently missing a
    * short embedded passage. O(n) via a monotonic deque. */
  def kernel(text: String, k: Int, window: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val hashes = WinnowFingerprint.gramHashes(text, k)
    if (hashes == null) return null
    val n = hashes.length
    val nw = math.max(n - window + 1, 1)
    val minima = new Array[Long](nw)
    val deque = new Array[Int](n) // indices, increasing hash values
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i
      tail += 1
      val wStart = i - window + 1
      while (deque(head) < wStart) head += 1
      if (i >= window - 1 || i == n - 1) {
        // one minimum per full window; a text shorter than one window
        // contributes its single global minimum
        val out = math.max(i - (window - 1), 0)
        if (out < nw) minima(out) = hashes(deque(head))
      }
      i += 1
    }
    java.util.Arrays.sort(minima)
    var distinct = 0
    i = 0
    while (i < nw) {
      if (i == 0 || minima(i) != minima(i - 1)) {
        minima(distinct) = minima(i)
        distinct += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(minima, distinct))
  }

  def apply(text: Column, k: Int, window: Int): Column =
    ColumnBridge.column(WinnowPrintSet(ColumnBridge.expression(text), k, window))
}

/** Gopher-style repetition metrics of the whitespace token stream as
  * ONE row-local native expression: `[top_unigram_frac,
  * dup_bigram_frac]` — the fraction of tokens that are the single most
  * frequent token, and the fraction of bigram occurrences that are
  * duplicates of an earlier one. The two standard cheap
  * excessive-repetition signals a quality filter thresholds (boilerplate,
  * keyword stuffing, generation loops). Exact string counting (hash
  * maps on the tokens, no hashed approximation), NULL for NULL/blank
  * text, dup_bigram_frac = 0 for single-token docs. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(v: Any): Any =
    RepetitionStats.kernel(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("rep")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.RepetitionStats.kernel($v.toString());
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  def kernel(text: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val trimmed = text.trim
    if (trimmed.isEmpty) return null
    val tokens = trimmed.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val n = tokens.length
    val uni = new java.util.HashMap[String, Int](n * 2)
    var maxCount = 0
    var i = 0
    while (i < n) {
      val c = uni.merge(tokens(i), 1, Integer.sum)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val topFrac = maxCount.toDouble / n
    var dupFrac = 0.0
    if (n >= 2) {
      val bi = new java.util.HashSet[String](n * 2)
      var dis = 0
      i = 0
      while (i < n - 1) {
        // length-prefixed key: the boundary between the two tokens is
        // unambiguous whatever characters they contain, so distinct
        // bigrams can never serialize to the same key (a bare separator
        // could collide when a token itself contains it)
        if (bi.add(tokens(i).length + ":" + tokens(i) + tokens(i + 1))) dis += 1
        i += 1
      }
      dupFrac = (n - 1 - dis).toDouble / (n - 1)
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(topFrac, dupFrac))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))
}

/** Distinct word-n-gram hash set of a text column as a native
  * expression: the same fused tokenize→token-hash→FNV-window pass as
  * [[MinHashSignature]], but emitting the DISTINCT window hashes
  * (sorted) instead of per-bin minima — the exact-verify side of the
  * dedup pipeline. `array_intersect`/`array_union` over `array<bigint>`
  * then compute n-gram Jaccard with no n-gram strings ever built
  * (hash-collision error is ~2⁻⁶⁴ per gram pair, far below the
  * 6-decimal rounding the driver compares at). NULL for NULL text or
  * fewer tokens than the window. */
case class NgramHashSet(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ngram_hashset"

  override protected def nullSafeEval(v: Any): Any = {
    val hs = NgramHashSet.kernel(v.asInstanceOf[UTF8String].toString, shingleSize)
    if (hs == null) null else UnsafeArrayData.fromPrimitiveArray(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("grams")
      s"""
         |long[] $r = graft.functions.NgramHashSet.kernel($v.toString(), $shingleSize);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashSet {
  def kernel(text: String, shingleSize: Int): Array[Long] = {
    val tokens = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val windows = tokens.length - (shingleSize - 1)
    if (windows <= 0 || (tokens.length == 1 && tokens(0).isEmpty)) null
    else {
      val tokenHash = new Array[Long](tokens.length)
      var i = 0
      while (i < tokens.length) {
        tokenHash(i) = DetRngHash.xx(tokens(i).getBytes("UTF-8"))
        i += 1
      }
      val hs = new Array[Long](windows)
      var w = 0
      while (w < windows) {
        var h0 = 0xcbf29ce484222325L
        var k = 0
        while (k < shingleSize) {
          h0 = (h0 ^ tokenHash(w + k)) * 0x100000001b3L
          k += 1
        }
        hs(w) = DetRngHash.mix(h0)
        w += 1
      }
      // sort + in-place dedup (the set is the value; order irrelevant to
      // intersect/union but sorted keeps the output canonical)
      java.util.Arrays.sort(hs)
      var out = 0
      i = 0
      while (i < windows) {
        if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
        i += 1
      }
      if (out == windows) hs else java.util.Arrays.copyOf(hs, out)
    }
  }

  def apply(text: Column, shingleSize: Int): Column =
    ColumnBridge.column(NgramHashSet(ColumnBridge.expression(text), shingleSize))
}

/** Hashed-feature bucket of a single token: unsigned
  * `mix(fnv1a64(utf8 bytes)) mod dim` — the feature-hashing step of the
  * trained quality classifier (p53; the hashing-trick of
  * fastText/DCLM-style filters). Shared verbatim between the training
  * aggregate and the scoring kernel ([[HashedLogOdds]]), and restated
  * in the DuckDB oracle through the p03 FNV/splitmix limb chain
  * (`z % dim` over the t6 state). NULL in → NULL out. */
case class TokenBucket(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a positive dimension, got $dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_bucket"

  override protected def nullSafeEval(v: Any): Any =
    TokenBucket.kernel(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenBucket.kernel($v, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenBucket {
  // xx already ends in the splitmix finalizer — no second mix
  def kernel(tok: UTF8String, dim: Int): Int =
    java.lang.Long.remainderUnsigned(
      DetRngHash.xx(tok.getBytes), dim.toLong).toInt

  def apply(tok: Column, dim: Int): Column =
    ColumnBridge.column(TokenBucket(ColumnBridge.expression(tok), dim))
}

/** Mean per-token hashed-bucket log-odds of the whitespace token stream
  * — the SCORING pass of the trained quality classifier (p53).
  * `logOdds(b)` is the per-bucket `ln P(b|pos) − ln P(b|neg)` learned
  * by the training aggregate; tokens bucket through the identical
  * [[TokenBucket]] kernel; the mean normalizes out document length
  * (the DCLM/CCNet normalized-score convention). One codegen'd
  * row-local pass, weights embedded as a plan reference object — the
  * corpus-wide scoring stage carries ZERO exchanges. NULL for NULL
  * text or an empty token stream.
  *
  * `mean = false` returns the per-token SUM instead — the document's
  * log importance weight under the two hashed unigram models (the
  * DSIR convention, p74: a weight is a product of per-token ratios,
  * so its log is the un-normalized sum; an empty token stream is an
  * empty product, i.e. 0.0, not NULL). */
case class HashedLogOdds(child: Expression, logOdds: Seq[Double],
    mean: Boolean = true)
    extends UnaryExpression {

  @transient private lazy val w: Array[Double] = logOdds.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if logOdds.nonEmpty => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty weight table")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hashed_log_odds"

  override protected def nullSafeEval(v: Any): Any =
    HashedLogOdds.kernel(v.asInstanceOf[UTF8String].toString, w, mean)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("logOdds", w, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("lo")
      s"""
         |java.lang.Double $r = graft.functions.HashedLogOdds.kernel($v.toString(), $wRef, $mean);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedLogOdds {
  // Tokenization MUST mirror the training pass (Spark trim/split in
  // nbQualityClassifier): maximal non-\s runs. Java String.trim strips
  // every char <= U+0020, so text bordered by control chars like 
  // would bucket differently at train vs score time — walk the string
  // with the shared TextKernelUtil.isWs class instead.
  def kernel(text: String, w: Array[Double], mean: Boolean): java.lang.Double = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    var sum = 0.0
    var n = 0L
    var i = 0
    while (i < s.length) {
      if (TextKernelUtil.isWs(s.charAt(i))) i += 1
      else {
        val start = i
        while (i < s.length && !TextKernelUtil.isWs(s.charAt(i))) i += 1
        sum += w(java.lang.Long.remainderUnsigned(
          DetRngHash.xx(s.substring(start, i).getBytes("UTF-8")),
          w.length.toLong).toInt)
        n += 1L
      }
    }
    if (!mean) java.lang.Double.valueOf(sum)
    else if (n == 0L) null
    else java.lang.Double.valueOf(sum / n)
  }

  def apply(text: Column, logOdds: Seq[Double]): Column =
    ColumnBridge.column(HashedLogOdds(ColumnBridge.expression(text), logOdds))

  def apply(text: Column, logOdds: Seq[Double], mean: Boolean): Column =
    ColumnBridge.column(
      HashedLogOdds(ColumnBridge.expression(text), logOdds, mean))
}

/** Shared kernel of the Bloom-filter membership gate (p75/st19): token
  * n-grams of the lowercased whitespace token stream (the
  * [[HashedLogOdds]] walk), each gram string hashed once with the
  * corpus-standard FNV-1a+splitmix chain ([[graft.operators.DetRngHash.xx]])
  * and probed at `probes` bit positions by Kirsch–Mitzenmacher double
  * hashing: pos_j = (h1 + j·h2) mod m with h2 = mix(h1) | 1 (odd, so
  * the probe stride never degenerates). Wrapping 64-bit adds ≡ mod 2⁶⁴
  * — the whole position computation restates in DuckDB through the
  * shared limb chain, so the filter's FALSE POSITIVES are bit-identical
  * across engines, not just its true hits. */
object BloomKernel {
  /** One gram's j-th probe position in [0, mBits). */
  def posOf(h1: Long, j: Int, mBits: Int): Int = {
    val h2 = DetRngHash.mix(h1) | 1L
    java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, mBits.toLong).toInt
  }

  /** Lowercased maximal-non-\s-run tokens (the HashedLogOdds walk). */
  private def tokens(text: String): java.util.ArrayList[String] = {
    val s = text.toLowerCase(java.util.Locale.ROOT)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < s.length) {
      if (TextKernelUtil.isWs(s.charAt(i))) i += 1
      else {
        val start = i
        while (i < s.length && !TextKernelUtil.isWs(s.charAt(i))) i += 1
        out.add(s.substring(start, i))
      }
    }
    out
  }

  private def gramHash(tk: java.util.ArrayList[String], start: Int,
      n: Int): Long = {
    val sb = new java.lang.StringBuilder(tk.get(start))
    var j = 1
    while (j < n) { sb.append(' ').append(tk.get(start + j)); j += 1 }
    DetRngHash.xx(sb.toString.getBytes("UTF-8"))
  }

  /** Every probe position of every n-gram (build side; duplicates kept
    * — the builder distincts). Empty for fewer than n tokens. */
  def gramPositions(text: UTF8String, n: Int, probes: Int,
      mBits: Int): UnsafeArrayData = {
    val tk = tokens(text.toString)
    val grams = math.max(0, tk.size - n + 1)
    val out = new Array[Long](grams * probes)
    var g = 0
    while (g < grams) {
      val h1 = gramHash(tk, g, n)
      var j = 0
      while (j < probes) { out(g * probes + j) = posOf(h1, j, mBits).toLong; j += 1 }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Number of the text's n-grams whose `probes` positions are ALL set
    * in `bits` (the membership test, FPs included by design). */
  def countHits(text: UTF8String, n: Int, probes: Int,
      bits: Array[Long]): Long = {
    val mBits = bits.length * 64
    val tk = tokens(text.toString)
    val grams = math.max(0, tk.size - n + 1)
    var hits = 0L
    var g = 0
    while (g < grams) {
      val h1 = gramHash(tk, g, n)
      var all = true
      var j = 0
      while (all && j < probes) {
        val p = posOf(h1, j, mBits)
        if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) all = false
        j += 1
      }
      if (all) hits += 1L
      g += 1
    }
    hits
  }
}

/** Build-side Bloom positions of a text's token n-grams (array of
  * longs; the filter builder explodes + distincts these — the exchange
  * is position rows, bounded by m after the distinct). NULL in → NULL
  * out (a NULL ref doc contributes nothing). */
case class BloomGramPositions(child: Expression, n: Int, probes: Int,
    mBits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && probes > 0 && mBits > 0 && mBits % 64 == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n/probes > 0 and mBits a positive multiple of 64")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_gram_positions"

  override protected def nullSafeEval(v: Any): Any =
    BloomKernel.gramPositions(v.asInstanceOf[UTF8String], n, probes, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomKernel.gramPositions($v, $n, $probes, $mBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Probe-side Bloom membership count: how many of the text's n-grams
  * hit the filter (all `probes` bits set). The bitset embeds as a plan
  * reference object — the corpus-wide probe is one row-local codegen'd
  * projection with ZERO exchanges (the whole point of the Bloom gate
  * vs. the exact-join decontamination path). NULL in → NULL out. */
case class BloomCountHits(child: Expression, n: Int, probes: Int,
    bits: Seq[Long]) extends UnaryExpression {

  @transient private lazy val b: Array[Long] = bits.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n > 0 && probes > 0 && bits.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs n/probes > 0 and a non-empty bitset")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_count_hits"

  override protected def nullSafeEval(v: Any): Any =
    BloomKernel.countHits(v.asInstanceOf[UTF8String], n, probes, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBits", b, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BloomKernel.countHits($v, $n, $probes, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomCountHits {
  def apply(text: Column, n: Int, probes: Int, bits: Seq[Long]): Column =
    ColumnBridge.column(
      BloomCountHits(ColumnBridge.expression(text), n, probes, bits))
}

object BloomGramPositions {
  def apply(text: Column, n: Int, probes: Int, mBits: Int): Column =
    ColumnBridge.column(
      BloomGramPositions(ColumnBridge.expression(text), n, probes, mBits))
}
