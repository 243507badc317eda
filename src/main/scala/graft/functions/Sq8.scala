package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** SQ8 scalar quantization (the FAISS-style memory-scale path IVF
  * pairs with at 100 TB: a float32 corpus shrinks 4× to one byte per
  * dimension; search scans CODES, reconstructing on the fly):
  * `code_d = clamp(floor((x_d − min_d) / scale_d), 0, 255)` with
  * `scale_d = (max_d − min_d)/255` from the corpus per-dimension
  * ranges (a degenerate dimension, scale 0, codes to 0). All
  * arithmetic is double-precision in a FIXED order, so the DuckDB
  * oracle reproduces every code bit-exactly — float→double promotion
  * is exact and IEEE ops are deterministic given the same expression
  * tree. One codegen'd row-local pass; NULL for null/misfit vectors. */
case class Sq8Quantize(child: Expression,
    mins: Seq[Double], scales: Seq[Double]) extends UnaryExpression {

  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val sc: Array[Double] = scales.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if mins.nonEmpty && mins.length == scales.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs aligned non-empty mins/scales")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<float> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq8_quantize"

  override protected def nullSafeEval(v: Any): Any =
    Sq8Quantize.kernel(v.asInstanceOf[ArrayData], mn, sc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("mins", mn, "double[]")
    val scRef = ctx.addReferenceObj("scales", sc, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.Sq8Quantize.kernel($v, $mnRef, $scRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Quantize {
  def kernel(vec: ArrayData, mn: Array[Double], sc: Array[Double]): ArrayData = {
    val n = vec.numElements()
    if (n != mn.length) return null
    var i = 0
    // NaN is a misfit like a null element: coding it silently to 0
    // would diverge from the oracle (whose CAST(floor(NaN)) errors) —
    // NULL keeps the row auditable and out of the ranking
    while (i < n) {
      if (vec.isNullAt(i) || java.lang.Float.isNaN(vec.getFloat(i))) return null
      i += 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val c =
        if (sc(i) == 0.0) 0L
        else math.floor((vec.getFloat(i).toDouble - mn(i)) / sc(i)).toLong
      out(i) = math.min(255L, math.max(0L, c)).toInt
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def apply(v: Column, mins: Seq[Double], scales: Seq[Double]): Column =
    ColumnBridge.column(Sq8Quantize(ColumnBridge.expression(v), mins, scales))
}

/** Asymmetric SQ8 cosine to an expression-embedded float query: the
  * document side is reconstructed per dimension as
  * `x̂_d = min_d + code_d·scale_d` and the score is
  * `dot/(sqrt(nx)·sqrt(nq))` with `dot = Σ x̂_d·q_d` and
  * `nx = Σ x̂_d²` accumulated in ascending dimension order (the two
  * accumulators never interact, so the DuckDB oracle's two ordered
  * list_reduce folds reproduce both bit-exactly); `nq` is precomputed
  * once per expression instance with the same ordered fold. NULL for
  * misfit vectors or a zero norm on either side. One codegen'd pass
  * over the CODES — the float corpus is never touched at query time. */
case class Sq8CosineQuery(child: Expression, query: Seq[Double],
    mins: Seq[Double], scales: Seq[Double]) extends UnaryExpression {

  @transient private lazy val q: Array[Double] = query.toArray
  @transient private lazy val mn: Array[Double] = mins.toArray
  @transient private lazy val sc: Array[Double] = scales.toArray
  @transient private lazy val nq: Double = {
    var s = 0.0; var i = 0
    while (i < q.length) { s += q(i) * q(i); i += 1 }
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _)
      if query.nonEmpty && query.length == mins.length && mins.length == scales.length =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs aligned non-empty query/mins/scales")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an array<int> code input, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_sq8_cosine"

  override protected def nullSafeEval(v: Any): Any =
    Sq8CosineQuery.kernel(v.asInstanceOf[ArrayData], q, mn, sc, nq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("query", q, "double[]")
    val mnRef = ctx.addReferenceObj("mins", mn, "double[]")
    val scRef = ctx.addReferenceObj("scales", sc, "double[]")
    val nqRef = ctx.addReferenceObj("nq", java.lang.Double.valueOf(nq), "java.lang.Double")
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("cos")
      s"""
         |java.lang.Double $r = graft.functions.Sq8CosineQuery.kernel(
         |  $v, $qRef, $mnRef, $scRef, $nqRef.doubleValue());
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8CosineQuery {
  def kernel(codes: ArrayData, q: Array[Double], mn: Array[Double],
      sc: Array[Double], nq: Double): java.lang.Double = {
    val n = codes.numElements()
    if (n != q.length) return null
    var dot = 0.0
    var nx = 0.0
    var i = 0
    while (i < n) {
      // a null code element is a misfit like Sq8Quantize's null/NaN
      // input elements: reading it as 0 would silently score a
      // corrupted vector — NULL keeps the row out of the ranking
      if (codes.isNullAt(i)) return null
      val x = mn(i) + codes.getInt(i) * sc(i)
      dot += x * q(i)
      nx += x * x
      i += 1
    }
    if (nx == 0.0 || nq == 0.0) return null
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(nq)))
  }

  def apply(codes: Column, query: Seq[Double], mins: Seq[Double],
      scales: Seq[Double]): Column =
    ColumnBridge.column(Sq8CosineQuery(
      ColumnBridge.expression(codes), query, mins, scales))
}
