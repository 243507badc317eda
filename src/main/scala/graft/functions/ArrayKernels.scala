package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Position-agreement count of two equal-length `array<bigint>` MinHash
  * signatures — the estimated-Jaccard numerator. One fused codegen'd
  * pass over the raw array data; replaces a `zip_with` + `aggregate`
  * higher-order pipeline evaluated per CANDIDATE PAIR on the LSH path
  * (at threshold 0.1 the pair set is large; the interpreted lambdas and
  * the intermediate indicator array were the cost). NULL when either
  * side is NULL or lengths differ. */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sig_agreement"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SignatureAgreement.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("agree")
      s"""
         |java.lang.Integer $r = graft.functions.SignatureAgreement.kernel($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SignatureAgreement {
  def kernel(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var agree = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    java.lang.Integer.valueOf(agree)
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SignatureAgreement(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** 64-bit random-hyperplane signature of an `array<float>` embedding as
  * a native expression: reads the raw float array data directly (the
  * UDF form converts every row into a boxed Seq first), planes
  * precomputed per (seed, dim). Bit-identical to the UDF it replaces.
  * NULL for NULL/empty vectors or null elements. */
case class HyperplaneSignature64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float> input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_sig"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSignature64.kernel(v.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sig")
      s"""
         |java.lang.Long $r = graft.functions.HyperplaneSignature64.kernel($v, ${seed}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignature64 {
  /** ±1 plane components, derived once per (seed, dim) per executor —
    * component (i, j) is the low bit of mix64(seed ^ i<<32 ^ j), the
    * same derivation the UDF form used. */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Long, Int), Array[Array[Float]]]
  private def planesFor(seed: Long, dim: Int): Array[Array[Float]] =
    planeCache.getOrElseUpdate((seed, dim), Array.tabulate(64, dim) { (i, j) =>
      if ((graft.operators.DetRngHash.mix(seed ^ (i.toLong << 32) ^ j.toLong) & 1L) == 1L)
        1f
      else -1f
    })

  def kernel(vec: ArrayData, seed: Long): java.lang.Long = {
    val n = vec.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val planes = planesFor(seed, n)
    var sig = 0L
    i = 0
    while (i < 64) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += p(j) * vec.getFloat(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  def apply(v: Column, seed: Long): Column =
    ColumnBridge.column(HyperplaneSignature64(ColumnBridge.expression(v), seed))
}

/** Multi-limb random-hyperplane signature: `bits` sign bits packed
  * little-endian into `bits/64` longs (bit i → limb i/64, position
  * i%64). Plane derivation is the [[HyperplaneSignature64]] scheme with
  * the plane index simply running past 63, so limb 0 of a 128-bit
  * signature IS the 64-bit signature (pinned by CosineExprSpec). The
  * wide form exists because an LSH config keying buckets on
  * sub-16-bit chunk values has a total key space that saturates
  * linearly with the corpus (the r12 scale-killer: 8 chunks × 2^8 =
  * 2,048 buckets); 128 bits give 8 chunks × 2^16 values each.
  * Row-local, codegen'd, NULL for empty vectors or null elements. */
case class HyperplaneSignatures(child: Expression, seed: Long, bits: Int)
    extends UnaryExpression {
  require(bits > 0 && bits % 64 == 0, "bits must be a positive multiple of 64")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hyperplane_sigs"

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSignatures.kernel(v.asInstanceOf[ArrayData], seed, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HyperplaneSignatures.kernel($v, ${seed}L, $bits);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSignatures {
  /** ±1 plane components for plane indices 0..bits-1 — same derivation
    * as the 64-bit form (mix(seed ^ i<<32 ^ j) low bit), cached per
    * (seed, bits, dim) per executor. Bounded: an entry is bits×dim
    * floats (128×1024 ≈ 512 KB), so a long-lived executor serving many
    * seeds/dims must not accumulate forever — plane tables are cheap to
    * recompute, so past 16 entries the cache just drops one. */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Long, Int, Int), Array[Array[Float]]]
  // LRU bookkeeping: lastHit[key] = tick of the most recent planesFor
  // hit. Eviction (on a miss, cache full) removes the LEAST-recently-hit
  // key, never the requested one — an arbitrary victim would let one
  // cold config's misses repeatedly evict another ACTIVE key, degrading
  // that key to a full bits×dim recompute per row (the thrash this
  // cache exists to avoid must hold for every live key, not just the
  // one currently requesting).
  private val lastHit =
    scala.collection.concurrent.TrieMap.empty[(Long, Int, Int), Long]
  private val tick = new java.util.concurrent.atomic.AtomicLong(0L)
  private def planesFor(seed: Long, bits: Int, dim: Int): Array[Array[Float]] = {
    val key = (seed, bits, dim)
    // hot path: plain lookup + a counter bump, no size traversal.
    planeCache.get(key) match {
      case Some(p) =>
        lastHit.put(key, tick.incrementAndGet())
        p
      case None =>
        while (planeCache.size >= 16) {
          val victims = planeCache.keys.filter(_ != key)
          if (victims.isEmpty)
            return planeCache.getOrElseUpdate(key, mkPlanes(seed, bits, dim))
          val v = victims.minBy(k => lastHit.getOrElse(k, 0L))
          planeCache.remove(v)
          lastHit.remove(v)
        }
        lastHit.put(key, tick.incrementAndGet())
        planeCache.getOrElseUpdate(key, mkPlanes(seed, bits, dim))
    }
  }
  private def mkPlanes(seed: Long, bits: Int, dim: Int): Array[Array[Float]] =
    Array.tabulate(bits, dim) { (i, j) =>
      if ((graft.operators.DetRngHash.mix(seed ^ (i.toLong << 32) ^ j.toLong) & 1L) == 1L)
        1f
      else -1f
    }

  def kernel(vec: ArrayData, seed: Long, bits: Int): ArrayData = {
    val n = vec.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val planes = planesFor(seed, bits, n)
    val limbs = new Array[Long](bits / 64)
    i = 0
    while (i < bits) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += p(j) * vec.getFloat(j)
        j += 1
      }
      if (dot >= 0) limbs(i / 64) |= (1L << (i % 64))
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(limbs)
  }

  def apply(v: Column, seed: Long, bits: Int): Column =
    ColumnBridge.column(HyperplaneSignatures(ColumnBridge.expression(v), seed, bits))
}

/** SplitMix64 finalizer of a long column as a native expression —
  * ANSI mode forbids wrapping multiplies in column arithmetic, so the
  * kernel ([[graft.operators.DetRngHash.mix]], the hash every
  * deterministic operator derives from) runs as one codegen'd call.
  * Null-propagating, never overflows (Java semantics). */
case class Mix64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a bigint input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_mix64"

  override protected def nullSafeEval(v: Any): Any =
    graft.operators.DetRngHash.mix(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.operators.DetRngHash.mix($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mix64 {
  def apply(c: Column): Column =
    ColumnBridge.column(Mix64(ColumnBridge.expression(c)))
}

/** Nearest-centroid assignment for the IVF index: argmin over the
  * (expression-embedded) centroid table of squared Euclidean distance to
  * an `array<double>` vector — the whole corpus-side assignment pass
  * stays inside whole-stage codegen (the MLlib form it replaces paid a
  * vector conversion plus a model-transform job). NULL for empty/null
  * vectors, null elements, or a dimension mismatch with the centroids. */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty centroid table")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroid.kernel(v.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Integer $r = graft.functions.NearestCentroid.kernel($v, $centsRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def kernel(vec: ArrayData, cents: Array[Array[Double]]): java.lang.Integer = {
    val n = vec.numElements()
    if (n == 0 || cents.length == 0 || cents(0).length != n) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var d = 0.0
      var j = 0
      while (j < n) { val x = vec.getDouble(j) - cc(j); d += x * x; j += 1 }
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  def apply(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), centroids))
}

/** Random-sign (Rademacher) projection for Johnson–Lindenstrauss
  * dimensionality reduction ([[graft.operators.SimilaritySearch
  * .randomSignProject]]): `out[j] = Σ_d ±v[d]`, the sign matrix
  * embedded as a plan reference object (the [[NearestCentroid]]
  * pattern). Additions only, folded in dimension order from 0.0 — no
  * transcendental, no multiply — so every projected double is exactly
  * restatable as an ordered SQL fold. The conventional `1/√k` scale is
  * deliberately omitted: downstream cosine similarity is
  * scale-invariant, and omitting it keeps the arithmetic pure
  * addition. NULL for empty/null vectors, null elements, or a
  * dimension mismatch with the sign matrix. */
case class SignedProject(child: Expression, signs: Seq[Seq[Boolean]])
    extends UnaryExpression {

  @transient private lazy val sg: Array[Array[Boolean]] =
    signs.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if signs.nonEmpty && signs.forall(_.length == signs.head.length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty rectangular sign matrix")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_signed_project"

  override protected def nullSafeEval(v: Any): Any =
    SignedProject.kernel(v.asInstanceOf[ArrayData], sg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sgRef = ctx.addReferenceObj("signs", sg, "boolean[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("proj")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.SignedProject.kernel($v, $sgRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignedProject {
  def kernel(vec: ArrayData, sg: Array[Array[Boolean]]): ArrayData = {
    val n = vec.numElements()
    if (n == 0 || sg.length == 0 || sg(0).length != n) return null
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Double](sg.length)
    var j = 0
    while (j < sg.length) {
      val row = sg(j)
      var acc = 0.0
      var d = 0
      while (d < n) {
        val x = vec.getDouble(d)
        acc += (if (row(d)) x else -x)
        d += 1
      }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  def apply(v: Column, signs: Seq[Seq[Boolean]]): Column =
    ColumnBridge.column(SignedProject(ColumnBridge.expression(v), signs))
}

/** Argmax-COSINE centroid assignment for semantic dedup
  * ([[graft.operators.SimilaritySearch.semDedup]]): index of the
  * expression-embedded centroid with the largest cosine similarity to an
  * `array<double>` vector, ties broken to the SMALLEST index (a
  * candidate wins only on strictly greater cosine). One codegen'd loop
  * over the centroid table — the corpus-side assignment pass is a
  * row-local projection, no shuffle, no UDF. Centroid L2 norms are
  * precomputed once per expression instance (not per row); a zero-norm
  * centroid has undefined cosine and can never win (NaN fails every
  * strict comparison). NULL for empty/null vectors, null elements, a
  * dimension mismatch, or a ZERO-NORM input vector — callers that want
  * loud failure wrap the NULL (the operator layer raises). */
case class NearestCentroidCosine(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    NearestCentroidCosine.normsOf(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a non-empty centroid table")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid_cosine"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidCosine.kernel(v.asInstanceOf[ArrayData], cents, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Integer $r = graft.functions.NearestCentroidCosine.kernel($v, $centsRef, $normsRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidCosine {
  private[graft] def normsOf(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      math.sqrt(s)
    }

  def kernel(vec: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double]): java.lang.Integer = {
    val n = vec.numElements()
    if (n == 0 || cents.length == 0 || cents(0).length != n) return null
    var i = 0
    var vn = 0.0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = vec.getDouble(i)
      vn += x * x
      i += 1
    }
    if (vn == 0.0) return null
    val vnorm = math.sqrt(vn)
    var best = -1
    var bc = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vec.getDouble(j) * cc(j); j += 1 }
      val cos = dot / (vnorm * norms(c))
      if (cos > bc) { bc = cos; best = c }
      c += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  def apply(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroidCosine(ColumnBridge.expression(v), centroids))
}

/** TWO-LEVEL argmax-cosine centroid assignment — the scale path for
  * [[graft.operators.SimilaritySearch.semDedup]] when k grows with the
  * corpus (k = n/B makes the flat argmax n·k·d = n²d/B FLOPs — a
  * quadratic scale-killer the 100× probe measured at 52×). The centroid
  * table is itself partitioned IVF-style: `superIdx` names a subset of
  * centroids as super-centroids, `members(s)` lists (ascending) the
  * global centroid indices whose nearest super (by the SAME
  * strictly-greater/smallest-index argmax rule) is s. A row first picks
  * its super (|supers|·d work), then argmaxes over that super's member
  * group only (~B·d work) — n·d·(k/F + F·B/B) instead of n·k·d. The
  * result is the nearest centroid WITHIN the probed group (IVF nProbe=1
  * semantics — an approximation of the flat argmax that is itself
  * exactly deterministic and independently restatable; with ONE super
  * it reduces bit-exactly to the flat rule). Ties at both levels break
  * to the smallest index (strictly-greater-wins). NULL under the same
  * conditions as [[NearestCentroidCosine]]. Returns the GLOBAL centroid
  * index. */
case class NearestCentroidCosine2L(child: Expression,
    centroids: Seq[Seq[Double]], superIdx: Seq[Int], members: Seq[Seq[Int]])
    extends UnaryExpression {

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    NearestCentroidCosine.normsOf(cents)
  @transient private lazy val supers: Array[Int] = superIdx.toArray
  @transient private lazy val groups: Array[Array[Int]] =
    members.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if centroids.nonEmpty && superIdx.nonEmpty &&
          members.length == superIdx.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs non-empty centroids/supers and |members| == |supers|")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid_cosine_2l"

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidCosine2L.kernel(
      v.asInstanceOf[ArrayData], cents, norms, supers, groups)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    val supersRef = ctx.addReferenceObj("superIdx", supers, "int[]")
    val groupsRef = ctx.addReferenceObj("memberGroups", groups, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("cell")
      s"""
         |java.lang.Integer $r = graft.functions.NearestCentroidCosine2L.kernel($v, $centsRef, $normsRef, $supersRef, $groupsRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidCosine2L {
  def kernel(vec: ArrayData, cents: Array[Array[Double]],
      norms: Array[Double], supers: Array[Int],
      groups: Array[Array[Int]]): java.lang.Integer = {
    val n = vec.numElements()
    if (n == 0 || cents.length == 0 || cents(0).length != n) return null
    var i = 0
    var vn = 0.0
    while (i < n) {
      if (vec.isNullAt(i)) return null
      val x = vec.getDouble(i)
      vn += x * x
      i += 1
    }
    if (vn == 0.0) return null
    val vnorm = math.sqrt(vn)
    def cosTo(c: Int): Double = {
      val cc = cents(c)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += vec.getDouble(j) * cc(j); j += 1 }
      dot / (vnorm * norms(c))
    }
    var bestS = -1
    var bs = Double.NegativeInfinity
    var s = 0
    while (s < supers.length) {
      val cos = cosTo(supers(s))
      if (cos > bs) { bs = cos; bestS = s }
      s += 1
    }
    if (bestS < 0) return null
    val group = groups(bestS)
    var best = -1
    var bc = Double.NegativeInfinity
    var g = 0
    while (g < group.length) {
      val cos = cosTo(group(g))
      if (cos > bc) { bc = cos; best = group(g) }
      g += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }

  /** Driver-side flat argmax over a plain array — used to build the
    * centroid→super member groups with the SAME comparison rule the
    * row kernel applies. */
  def assignFlat(v: Array[Double], cents: Array[Array[Double]],
      norms: Array[Double]): Int = {
    var vn = 0.0
    var i = 0
    while (i < v.length) { vn += v(i) * v(i); i += 1 }
    val vnorm = math.sqrt(vn)
    var best = -1
    var bc = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var dot = 0.0
      var j = 0
      while (j < v.length) { dot += v(j) * cc(j); j += 1 }
      val cos = dot / (vnorm * norms(c))
      if (cos > bc) { bc = cos; best = c }
      c += 1
    }
    best
  }

  def apply(v: Column, centroids: Seq[Seq[Double]], superIdx: Seq[Int],
      members: Seq[Seq[Int]]): Column =
    ColumnBridge.column(NearestCentroidCosine2L(
      ColumnBridge.expression(v), centroids, superIdx, members))
}
