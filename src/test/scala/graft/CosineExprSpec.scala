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

  test("signature agreement counts equal positions; NULL on mismatch") {
    import graft.functions.SignatureAgreement
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 8L))).toDF("a", "b")
    assert(df.select(SignatureAgreement(col("a"), col("b"))).head.getInt(0) == 2)
    // parity with the zip_with/aggregate formulation it replaced
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(100)((Seq.fill(32)(rnd.nextInt(4).toLong),
      Seq.fill(32)(rnd.nextInt(4).toLong)))
    val both = rows.toDF("a", "b").select(
      SignatureAgreement(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).as("hof"))
    assert(both.filter(not(col("native") === col("hof"))).count() == 0)
    val mism = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
    assert(mism.select(SignatureAgreement(col("a"), col("b"))).head.isNullAt(0))
  }

  test("hyperplane signature expression matches a reference reimplementation") {
    import graft.functions.HyperplaneSignature64
    import graft.operators.DetRngHash
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(50)(Seq.fill(24)(rnd.nextFloat() - 0.5f))
    def reference(v: Seq[Float], seed: Long): Long = {
      var sig = 0L
      for (i <- 0 until 64) {
        var dot = 0.0
        for (j <- v.indices) {
          val h = DetRngHash.mix(seed ^ (i.toLong << 32) ^ j.toLong)
          dot += (if ((h & 1L) == 1L) v(j) else -v(j))
        }
        if (dot >= 0) sig |= (1L << i)
      }
      sig
    }
    val got = vecs.toDF("v")
      .select(HyperplaneSignature64(col("v"), 42L)).collect().map(_.getLong(0))
    assert(got.toSeq == vecs.map(reference(_, 42L)))
    // NULL for the empty vector
    assert(Seq(Seq.empty[Float]).toDF("v")
      .select(HyperplaneSignature64(col("v"), 42L)).head.isNullAt(0))
  }

  test("multi-limb hyperplane signature extends the 64-bit one (limb 0 identical)") {
    import graft.functions.{HyperplaneSignature64, HyperplaneSignatures}
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(40)(Seq.fill(24)(rnd.nextFloat() - 0.5f))
    val rows = vecs.toDF("v").select(
      HyperplaneSignature64(col("v"), 42L).as("sig64"),
      HyperplaneSignatures(col("v"), 42L, 128).as("sigs")).collect()
    for (r <- rows) {
      val limbs = r.getSeq[Long](1)
      assert(limbs.length == 2)
      // planes 0..63 derive identically, so limb 0 IS the 64-bit sig
      assert(limbs(0) == r.getLong(0))
    }
    // the second limb is a different plane set, not a copy
    assert(rows.exists(r => r.getSeq[Long](1)(0) != r.getSeq[Long](1)(1)))
    // NULL for the empty vector
    assert(Seq(Seq.empty[Float]).toDF("v")
      .select(HyperplaneSignatures(col("v"), 42L, 128)).head.isNullAt(0))
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
