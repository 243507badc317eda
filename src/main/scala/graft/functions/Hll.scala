package graft.functions

import graft.operators.DetRngHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog register observation of a string key (Flajolet et al.
  * 2007): hash the key through the corpus-standard FNV-1a+splitmix
  * chain ([[graft.operators.DetRngHash.xx]] — the same auditable limb
  * arithmetic every oracle-backed signature relies on), take the top
  * `p` bits as the register index and the 1-based leading-one rank of
  * the remaining `64-p` bits as rho, packed as `(reg << 8) | rho`
  * (rho ≤ 64-p+1 ≤ 61 for the supported p ≥ 4, so 8 bits suffice).
  *
  * One codegen'd row-local pass — the distinct-counting exchange this
  * feeds carries at most (groups × 2^p) register rows instead of every
  * distinct key, which is the entire point of the sketch at 100 TB.
  * The unpack is plain column arithmetic (`pk >> 8`, `pk & 255`), so
  * downstream aggregation stays in whole-stage codegen. NULL for NULL
  * keys (HLL ignores NULLs, matching COUNT(DISTINCT)).
  *
  * Why not Spark's own `approx_count_distinct`: that HLL++ sketch is
  * neither mergeable outside Spark nor restatable by an external
  * engine; this register stream is reproduced bit-exactly by the
  * DuckDB oracle (p76), so the approximation itself is gated, not
  * trusted. Reference has no sketch surface (closest analogue is the
  * exact COUNT(DISTINCT) path, reference `src/bql.py` SELECT
  * compilation); this is a pipeline extension.
  */
case class HllRegRho(child: Expression, p: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if p >= 4 && p <= 16 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs 4 <= p <= 16, got $p")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hll_reg_rho"

  override protected def nullSafeEval(v: Any): Any =
    HllRegRho.kernel(v.asInstanceOf[UTF8String], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.HllRegRho.kernel($v, $p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The corpus-standard 64-bit string hash ([[graft.operators
  * .DetRngHash.xx]]: FNV-1a over UTF-8 bytes, splitmix-finalized) as a
  * native expression — the shared primitive under the sketch family
  * (HLL registers, Count–Min cells). Exposed so sketch cell math stays
  * plain column arithmetic over ONE hash evaluation instead of a
  * per-row kernel per derived value. NULL-propagating. */
case class Xx64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_xx64"

  override protected def nullSafeEval(v: Any): Any =
    DetRngHash.xx(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.operators.DetRngHash.xx($v.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Xx64 {
  def apply(c: Column): Column =
    ColumnBridge.column(Xx64(ColumnBridge.expression(c)))
}

object HllRegRho {

  def kernel(key: UTF8String, p: Int): Int = {
    val z = DetRngHash.xx(key.getBytes)
    val reg = (z >>> (64 - p)).toInt
    val rest = z & ((1L << (64 - p)) - 1L)
    val rho =
      if (rest == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(rest) - p + 1
    (reg << 8) | rho
  }

  def apply(key: Column, p: Int): Column =
    ColumnBridge.column(HllRegRho(ColumnBridge.expression(key), p))
}
