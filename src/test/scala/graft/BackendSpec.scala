package graft

import graft.backends._
import graft.backends.NigNormalBackend._
import graft.engine.{Estimators, FittedGenerator, PopulationModel}
import graft.catalog.{Population, StatType, Variable}
import org.scalatest.funsuite.AnyFunSuite

class DetRngSpec extends AnyFunSuite {

  test("same (seed, keys) reproduces the identical stream; different keys differ") {
    val a = DetRng(42L, 7L, 3L)
    val b = DetRng(42L, 7L, 3L)
    val c = DetRng(42L, 7L, 4L)
    val sa = Array.fill(20)(a.nextLong())
    val sb = Array.fill(20)(b.nextLong())
    val sc = Array.fill(20)(c.nextLong())
    assert(sa.sameElements(sb))
    assert(!sa.sameElements(sc))
  }

  test("nextDouble in [0,1); nextInt bounded and roughly uniform") {
    val rng = DetRng(1L)
    val us = Array.fill(10000)(rng.nextDouble())
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    val ints = Array.fill(30000)(rng.nextInt(3))
    val counts = ints.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts.keySet == Set(0, 1, 2))
    counts.values.foreach(c => assert(math.abs(c - 10000) < 600, counts.toString))
  }

  test("gaussian moments") {
    val rng = DetRng(7L)
    val xs = Array.fill(50000)(rng.nextGaussian())
    val mean = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
    assert(math.abs(mean) < 0.02, s"mean=$mean")
    assert(math.abs(sd - 1.0) < 0.02, s"sd=$sd")
  }

  test("gamma mean/variance match shape/scale") {
    val rng = DetRng(11L)
    for (shape <- Seq(0.5, 1.0, 2.5, 9.0)) {
      val xs = Array.fill(40000)(rng.nextGamma(shape, 2.0))
      val mean = xs.sum / xs.length
      assert(math.abs(mean - shape * 2.0) < 0.12 * shape * 2.0,
        s"shape=$shape mean=$mean")
    }
  }

  test("logCategorical respects weights") {
    val rng = DetRng(13L)
    // weights 1:3 in log space
    val draws = Array.fill(40000)(
      rng.logCategorical(IndexedSeq(math.log(1.0), math.log(3.0))))
    val p1 = draws.count(_ == 1).toDouble / draws.length
    assert(math.abs(p1 - 0.75) < 0.02, s"p1=$p1")
  }
}

class NigNormalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val hypers = (0.0, 1.0, 1.0, 1.0)

  test("posteriorHypers matches hand computation") {
    // stats: n=2, sum=6, sumsq=20 (values 2 and 4); hypers (0,1,1,1)
    val (mn, vn, an, bn) = posteriorHypers(hypers, ColStats(2, 6.0, 20.0))
    assert(math.abs(vn - 1.0 / 3.0) < 1e-12)
    assert(math.abs(mn - 2.0) < 1e-12)       // (1/3)*(0 + 6)
    assert(math.abs(an - 2.0) < 1e-12)       // 1 + 2/2
    assert(math.abs(bn - (1.0 + 0.5 * (20.0 - 4.0 * 3.0))) < 1e-12) // 1+0.5*(0+20-12)=5
  }

  test("createGenerator computes suff stats distributedly") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = new NigNormalBackend()
    val st = b.createGenerator(df, Map(0 -> "x")).asInstanceOf[State]
    assert(st.cols(0) == ColStats(4, 10.0, 30.0))
  }

  test("null values are excluded from suff stats") {
    val df = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("x")
    val b = new NigNormalBackend()
    val st = b.createGenerator(df, Map(0 -> "x")).asInstanceOf[State]
    assert(st.cols(0) == ColStats(2, 4.0, 10.0))
  }

  test("initializeModels is deterministic under DetRng and analyze redraws") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = new NigNormalBackend()
    val st = b.createGenerator(df, Map(0 -> "x"))
    val m1 = b.initializeModels(st, 0 until 4, DetRng(42L)).asInstanceOf[State]
    val m2 = b.initializeModels(st, 0 until 4, DetRng(42L)).asInstanceOf[State]
    assert(m1.models == m2.models)
    assert(m1.modelNumbers == Seq(0, 1, 2, 3))
    val m3 = b.analyzeModels(m1, None, 1, DetRng(43L)).asInstanceOf[State]
    assert(m3.models != m1.models) // redrawn from posterior
    assert(m3.modelNumbers == m1.modelNumbers)
  }

  test("posterior concentrates on the data-generating parameters") {
    val gen = DetRng(7L, 0xdadaL)
    val xs = Array.fill(20000)(gen.gauss(5.0, 2.0))
    val df = xs.toSeq.toDF("x")
    val b = new NigNormalBackend()
    val st = b.initializeModels(
      b.createGenerator(df, Map(0 -> "x")), 0 until 32, DetRng(42L))
      .asInstanceOf[State]
    val mus = st.models.values.map(_(0).mu)
    val sigmas = st.models.values.map(_(0).sigma)
    val muBar = mus.sum / mus.size
    val sigmaBar = sigmas.sum / sigmas.size
    assert(math.abs(muBar - 5.0) < 0.1, s"muBar=$muBar")
    assert(math.abs(sigmaBar - 2.0) < 0.1, s"sigmaBar=$sigmaBar")
  }

  test("logpdfJoint on a hand-built single-model state") {
    val st = State(hypers, Map(0 -> ColStats(1, 0, 0)),
      Map(0 -> Map(0 -> ColParams(1.0, 2.0))), Map.empty)
    val b = new NigNormalBackend()
    val got = b.logpdfJoint(st, None, Seq((0, 3.0)), Nil)
    assert(math.abs(got - logpdfGaussian(3.0, 1.0, 2.0)) < 1e-12)
    // two models → logmeanexp of the two
    val st2 = st.copy(models = st.models + (1 -> Map(0 -> ColParams(0.0, 1.0))))
    val expect = graft.functions.SpecialMath.logMeanExp(Array(
      logpdfGaussian(3.0, 1.0, 2.0), logpdfGaussian(3.0, 0.0, 1.0)))
    assert(math.abs(b.logpdfJoint(st2, None, Seq((0, 3.0)), Nil) - expect) < 1e-12)
  }

  test("simulate draws from the chosen model's Gaussian") {
    val st = State(hypers, Map(0 -> ColStats(1, 0, 0)),
      Map(0 -> Map(0 -> ColParams(10.0, 0.5))), Map.empty)
    val b = new NigNormalBackend()
    val rows = b.simulateJoint(st, None, Seq(0), Nil, 20000, DetRng(3L))
    val vals = rows.map(_.head)
    val mean = vals.sum / vals.size
    assert(math.abs(mean - 10.0) < 0.05, s"mean=$mean")
  }

  test("troll backend semantics") {
    val b = new TrollBackend()
    val st = b.initializeModels(b.createGenerator(null, Map.empty), Seq(0, 1), DetRng(1L))
    assert(b.logpdfJoint(st, None, Seq((0, 9.0)), Seq((1, 9.0))) == 0.0)
    assert(b.logpdfJoint(st, None, Seq((0, 8.0)), Nil).isNegInfinity)
    assert(b.logpdfJoint(st, None, Seq((0, 9.0)), Seq((1, 7.0))).isNaN)
    assert(b.simulateJoint(st, None, Seq(0, 1), Nil, 3, DetRng(1L)) ==
      Seq(Seq(9.0, 9.0), Seq(9.0, 9.0), Seq(9.0, 9.0)))
  }

  test("std_normal logpdf is the standard normal") {
    val b = new StdNormalBackend()
    val st = b.initializeModels(b.createGenerator(null, Map(0 -> "x")), Seq(0), DetRng(1L))
    assert(math.abs(b.logpdfJoint(st, None, Seq((0, 0.0)), Nil) -
      (-0.5 * math.log(2 * math.Pi))) < 1e-12)
  }
}

class EstimatorsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def fixture(): (org.apache.spark.sql.DataFrame, PopulationModel) = {
    val df = Seq(
      (1L, Some(1.0), 10.0), (2L, Some(2.0), 11.0), (3L, None: Option[Double], 12.0),
      (4L, Some(4.0), 13.0), (5L, Some(5.0), 14.0))
      .toDF("rowid", "x", "y")
    val vars = Seq(Variable("x", 0, StatType.Numerical), Variable("y", 1, StatType.Numerical))
    val b = Backends.byName("nig_normal")
    val st = b.analyzeModels(
      b.initializeModels(
        b.createGenerator(df, Map(0 -> "x", 1 -> "y")), 0 until 4, DetRng(42L)),
      None, 1, DetRng(43L))
    (df, PopulationModel(Population(1, "p", "t", vars),
      Seq(FittedGenerator("g", b, st)), 42L))
  }

  test("predictiveProbability: positive for observed, NULL for NULL target") {
    val (df, pm) = fixture()
    val got = Estimators.predictiveProbability(df, pm, Seq("x"), Seq("y"))
      .select("rowid", "predictive_probability").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(3L).isEmpty, "NULL target must give NULL")
    assert(got(1L).exists(p => p > 0 && p < 1))
  }

  test("probabilityDensity is a positive constant and integrates sanely") {
    val (_, pm) = fixture()
    val d = Estimators.probabilityDensity(pm, Seq("x" -> 3.0), Seq("y" -> 12.0))
    assert(d > 0)
  }

  test("simulate returns requested row count with target schema") {
    val (_, pm) = fixture()
    val out = Estimators.simulate(spark, pm, Seq("x", "y"), Seq("y" -> 12.0), 37)
    assert(out.count() == 37)
    assert(out.columns.toSeq == Seq("x", "y"))
  }

  test("inferWithConfidence fills exactly the NULL cells") {
    val (df, pm) = fixture()
    val out = Estimators.inferWithConfidence(df, pm, "x", 0.5)
    val got = out.select("rowid", "x").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 1.0 && got(2L) == 2.0, "observed cells unchanged")
    assert(!got(3L).isNaN, "NULL cell imputed")
    // deterministic across evaluations
    val again = Estimators.inferWithConfidence(df, pm, "x", 0.5)
      .select("rowid", "x").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == again)
  }

  test("dependence self-pair is 1, cross-pair 0 for nig_normal") {
    val (_, pm) = fixture()
    assert(Estimators.dependenceProbability(pm, "x", "x") == 1.0)
    assert(Estimators.dependenceProbability(pm, "x", "y") == 0.0)
    val pw = Estimators.pairwiseVariables(spark, pm,
      (a, b) => Estimators.dependenceProbability(pm, a, b), "depprob")
    assert(pw.count() == 4)
  }
}

/** Instance-scoped backend registration — the analogue of the
  * reference's `bayesdb_register_backend(bdb, backend)`
  * (src/__init__.py:82-96; its tests register LoomBackend this way). */
class RegisterBackendSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.bql.BayesDB

  test("user-registered backend resolves by name; unregistered errors") {
    val b = new BayesDB(spark, seed = 3L)
    b.registerTable("rt", (1 to 20).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b.execute("create population rp for rt (id ignore; x numerical)")
    // CREATE stores the name; resolution happens at INITIALIZE
    b.execute("create generator rg for rp using mycustom")
    val e = intercept[IllegalArgumentException] {
      b.execute("initialize 2 models for rg")
    }
    assert(e.getMessage.contains("Unknown backend"))
    val custom = new NigNormalBackend() { override def name: String = "mycustom" }
    b.registerBackend(custom)
    b.execute("initialize 2 models for rg")
    b.execute("analyze rg for 1 iteration")
    assert(b.execute("simulate x from rp limit 3").count() == 3)
    // registration is per-instance: a fresh engine does not see it
    val b2 = new BayesDB(spark, seed = 4L)
    b2.registerTable("rt2", (1 to 5).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b2.execute("create population rp2 for rt2 (id ignore; x numerical)")
    b2.execute("create generator rg2 for rp2 using mycustom")
    intercept[IllegalArgumentException] {
      b2.execute("initialize 1 models for rg2")
    }
  }

  test("a backend registered as 'cgpm' shadows the built-in, and SUBSAMPLE " +
      "options against the shadow reject loudly instead of silently bypassing") {
    val b = new BayesDB(spark, seed = 5L)
    b.registerTable("st", (1 to 30).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b.execute("create population sp for st (id ignore; x numerical)")
    var inits = 0
    val shadow = new NigNormalBackend() {
      override def name: String = "cgpm"
      override def initializeModels(st: graft.backends.GeneratorState,
          modelnos: Seq[Int], rng: graft.backends.DetRng): graft.backends.GeneratorState = {
        inits += 1
        super.initializeModels(st, modelnos, rng)
      }
    }
    b.registerBackend(shadow)
    // plain generator: the shadow must be the backend that runs
    b.execute("create generator sg for sp using cgpm")
    b.execute("initialize 1 models for sg")
    assert(inits == 1, "shadow backend must handle the plain cgpm generator")
    // SUBSAMPLE parameterizes only the built-in CrossCat; with a shadow
    // in place that is a contradiction the engine must surface, not
    // resolve by silently constructing the built-in
    b.execute("create generator sgsub for sp using cgpm (subsample 10)")
    val e = intercept[UnsupportedOperationException] {
      b.execute("initialize 1 models for sgsub")
    }
    assert(e.getMessage.contains("shadowed"))
  }
}
