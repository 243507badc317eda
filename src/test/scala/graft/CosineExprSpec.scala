package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native cosine Catalyst expression: bit-parity with the
  * higher-order formulation it replaced, NULL semantics, and
  * whole-stage-codegen participation. */
class CosineExprSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(dot / (na * nb))
  }

  test("bit-identical to the zip_with/aggregate formulation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((Seq.fill(16)(rnd.nextDouble() - 0.5),
      Seq.fill(16)(rnd.nextDouble() - 0.5)))
    val df = rows.toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("native"),
        hofCosine(col("a"), col("b")).as("hof"))
    // exact equality: same left-to-right summation order
    assert(df.filter(not(col("native") === col("hof"))).count() == 0)
    assert(df.filter(col("native").isNull).count() == 0)
  }

  test("NULL on zero norm, null element, length mismatch, null side") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),            // zero norm
      (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))        // length mismatch
    ).toDF("a", "b")
    assert(df.select(CosineSimilarity(col("a"), col("b"))).collect()
      .forall(_.isNullAt(0)))
    val withNulls = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(CosineSimilarity(col("a").cast("array<double>"), col("b").cast("array<double>")))
    assert(withNulls.collect().forall(_.isNullAt(0)))
    val nullSide = Seq((null: Seq[java.lang.Double], Seq[java.lang.Double](1.0)))
      .toDF("a", "b")
      .select(CosineSimilarity(col("a").cast("array<double>"), col("b").cast("array<double>")))
    assert(nullSide.collect().forall(_.isNullAt(0)))
  }

  test("identical vectors score 1.0; orthogonal score 0.0") {
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0), Seq(-4.0, 3.0))).toDF("a", "b", "c")
    val r = df.select(CosineSimilarity(col("a"), col("b")),
      CosineSimilarity(col("a"), col("c"))).head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(r.getDouble(1)) < 1e-15)
  }

  test("stays inside whole-stage codegen") {
    // a range source keeps the projection out of plan-time constant
    // folding, so the expression's doGenCode path is what runs
    val df = spark.range(8)
      .select(array(col("id").cast("double") + 1, lit(2.0)).as("a"),
        array(lit(2.0), col("id").cast("double") + 1).as("b"))
      .select(CosineSimilarity(col("a"), col("b")).as("c"))
      .filter(col("c") > 0)
    // `*(n)` prefixes mark operators fused into a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_cosine") && l.trim.startsWith("*")),
      s"expected graft_cosine inside a codegen span:\n$plan")
    // and the generated code actually compiles + runs
    assert(df.count() == 8)
  }
}
