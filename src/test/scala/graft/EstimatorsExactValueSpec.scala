package graft

import graft.backends.{Backends, DetRng}
import graft.catalog.{Population, StatType, Variable}
import graft.engine.{Estimators, FittedGenerator, PopulationModel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Estimator-layer tests pinning exact values with the deterministic toy
  * backends (reference: tests/test_backends.py runs the backend contract
  * over troll/std_normal for the same reason — exact expectations). */
class EstimatorsExactValueSpec extends AnyFunSuite {
  import TestSpark._

  private val vars = Seq(
    Variable("x", 0, StatType.Numerical),
    Variable("y", 1, StatType.Numerical))

  private def fit(backendName: String): PopulationModel = {
    import spark.implicits._
    val df = Seq((1L, 9.0, 9.0), (2L, 9.0, 9.0), (3L, 9.0, 9.0))
      .toDF("rowid", "x", "y")
    val backend = Backends.byName(backendName)
    val st0 = backend.createGenerator(df, Map(0 -> "x", 1 -> "y"))
    val st1 = backend.initializeModels(st0, 0 until 4, DetRng(5L))
    val st2 = backend.analyzeModels(st1, None, 1, DetRng(6L))
    PopulationModel(Population(1, "p", "t", vars),
      Seq(FittedGenerator("g", backend, st2)), seed = 11L)
  }

  private lazy val troll = fit("troll_rng")
  private lazy val stdNormal = fit("std_normal")

  private lazy val data = {
    import spark.implicits._
    Seq((1L, 9.0, 9.0), (2L, 9.0, 9.0), (3L, 7.0, 9.0)).toDF("rowid", "x", "y")
  }

  test("troll: predictive probability is exactly 1 at 9, 0 elsewhere") {
    val out = Estimators.predictiveProbability(data, troll, Seq("x"))
      .orderBy("rowid")
      .collect().map(_.getAs[Double]("predictive_probability"))
    assert(out.toSeq == Seq(1.0, 1.0, 0.0))
  }

  test("std_normal: predictive probability equals the N(0,1) density exactly") {
    val out = Estimators.predictiveProbability(data, stdNormal, Seq("x"))
      .orderBy("rowid")
      .collect().map(_.getAs[Double]("predictive_probability"))
    def phi(x: Double) = math.exp(-x * x / 2) / math.sqrt(2 * math.Pi)
    assert(math.abs(out(0) - phi(9.0)) < 1e-15)
    assert(math.abs(out(2) - phi(7.0)) < 1e-15)
  }

  test("probability density: likelihood-weighted generator averaging") {
    // single generator: weights cancel; density = exp(logpdf)
    val d = Estimators.probabilityDensity(troll, Seq("x" -> 9.0), Seq("y" -> 9.0))
    assert(d == 1.0)
    val d2 = Estimators.probabilityDensity(troll, Seq("x" -> 3.0))
    assert(d2 == 0.0)
  }

  test("simulate: troll returns constant 9s; deterministic under seed") {
    val s1 = Estimators.simulate(spark, troll, Seq("x", "y"), Nil, 5)
      .collect().map(_.toSeq)
    assert(s1.forall(_ == Seq(9.0, 9.0)))
    val a = Estimators.simulate(spark, stdNormal, Seq("x"), Nil, 10)
      .collect().map(_.getDouble(0)).toSeq
    val b = Estimators.simulate(spark, stdNormal, Seq("x"), Nil, 10)
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b)
  }

  test("infer with confidence: troll fills nulls with 9 (confidence 1)") {
    import spark.implicits._
    val holes = Seq((1L, Some(1.5)), (2L, None: Option[Double]), (3L, Some(2.5)))
      .toDF("rowid", "x")
    val out = Estimators.inferWithConfidence(holes, troll, "x", 0.5)
      .orderBy("rowid").collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(1.5, 9.0, 2.5))
    // threshold above troll's confidence 1.0 is impossible; value still fills at 1.0
    val strict = Estimators.inferWithConfidence(holes, troll, "x", 1.0)
      .orderBy("rowid").collect().map(_.getDouble(1))
    assert(strict.toSeq == Seq(1.5, 9.0, 2.5))
  }

  test("predict explicit struct carries (value, confidence)") {
    val out = Estimators.predictExplicit(data, troll, "x")
      .select(col("prediction.value"), col("prediction.confidence"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.forall(_ == (9.0, 1.0)))
  }

  test("dependence probability and MI: toy backends are degenerate 0/1") {
    assert(Estimators.dependenceProbability(troll, "x", "y") == 0.0)
    assert(Estimators.dependenceProbability(troll, "x", "x") == 1.0)
    assert(Estimators.mutualInformation(troll, Seq("x"), Seq("y"), 10) == 0.0)
  }

  test("similarity and predictive relevance plumb the ensemble average") {
    assert(Estimators.similarityValue(troll, 1L, 2L, 0) == 0.0)
    assert(Estimators.predictiveRelevanceValue(
      fit("nig_normal"), 1L, Seq(2L), Seq(Seq(0 -> 9.0)), 0) == 0.0)
  }

  test("pairwise variables frame has the reference shape") {
    val df = Estimators.pairwiseVariables(spark, troll,
      (a, b) => Estimators.dependenceProbability(troll, a, b), "depprob")
    assert(df.columns.toSeq == Seq("population", "name0", "name1", "depprob"))
    assert(df.count() == 4)
  }

  test("estimator UDF closures broadcast the ensemble, not serialize it per task") {
    // the per-task serialized closure must carry only the Broadcast
    // handle: Java-serializing the ScalaUDF function object (exactly what
    // Spark ships with every task) must not embed GeneratorState
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val pm = fit("nig_normal")
    val cols = Seq(
      Estimators.predictiveProbabilityCol(pm, Seq("x"), Nil),
      Estimators.similarityCol(pm, 1L, 0, col("rowid")),
      Estimators.predictStructCol(pm, 0, 2, col("rowid")))
    for (c <- cols) {
      val analyzed = data.select(c.as("v")).queryExecution.analyzed
      val udfs = analyzed.expressions.flatMap(_.collect { case u: ScalaUDF => u })
      assert(udfs.nonEmpty, s"expected a ScalaUDF in $analyzed")
      for (u <- udfs) {
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(u.function)
        oos.close()
        val payload = new String(bos.toByteArray, "ISO-8859-1")
        assert(!payload.contains("GeneratorState"),
          "UDF closure serializes the model ensemble instead of a broadcast handle")
        assert(payload.contains("Broadcast"),
          "UDF closure does not carry a Broadcast handle")
      }
    }
    // and the values still flow through the broadcast correctly
    val out = Estimators.predictiveProbability(data, fit("troll_rng"), Seq("x"))
      .orderBy("rowid").collect().map(_.getAs[Double]("predictive_probability"))
    assert(out.toSeq == Seq(1.0, 1.0, 0.0))
  }
}
