package graft

import graft.backends._
import graft.bql.BayesDB
import org.scalatest.funsuite.AnyFunSuite

/** Native loom backend: the reference's loom adapter surface
  * (src/backends/loom_backend.py, tests/test_loom_backend.py) without the
  * external server — same CrossCat ensemble, loom's stricter contract. */
class LoomBackendSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val bdb: BayesDB = {
    val b = new BayesDB(spark, seed = 23L)
    // reference test_loom_backend.py:232-263 — x uniform, xx = 2x
    // (deterministically dependent), y independent, z nominal
    val rng = new scala.util.Random(5)
    b.registerTable("lt", (1 to 80).map { i =>
      val x = rng.nextInt(200).toDouble
      (i.toLong, x, 2 * x, rng.nextInt(100).toDouble,
        if (rng.nextBoolean()) "a" else "b")
    }.toDF("id", "x", "xx", "y", "z"))
    b.execute("create population lp for lt (id ignore; x numerical;" +
      " xx numerical; y numerical; z nominal)")
    b.execute("create generator lg for lp using loom")
    b.execute("initialize 8 models for lg")
    b.execute("analyze lg for 15 iterations")
    b
  }

  private def one(q: String): Any =
    bdb.execute(q).collect().head.get(0)

  test("registry resolves loom; loom analyze sequence runs end-to-end") {
    // reference test_loom_one_numeric: only checks for errors
    assert(Backends.byName("loom").name == "loom")
    val density = one("estimate probability density of x = 500 by lp")
      .asInstanceOf[Double]
    assert(density < 1e-4, s"far-out-of-range density must vanish, got $density")
    assert(bdb.execute("simulate x from lp limit 3").count() == 3)
  }

  test("estimators work right after INITIALIZE (loom runs one pass there)") {
    val b2 = new BayesDB(spark, seed = 29L)
    b2.registerTable("lt2", (1 to 30).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b2.execute("create population lp2 for lt2 (id ignore; x numerical)")
    b2.execute("create generator lg2 for lp2 using loom")
    b2.execute("initialize 2 models for lg2")
    // no ANALYZE — loom_backend.py:355-356 analyzes inside initialize
    assert(b2.execute("simulate x from lp2 limit 2").count() == 2)
    val d = b2.execute("estimate probability density of x = 15 by lp2")
      .collect().head.getDouble(0)
    assert(d > 0.0)
  }

  test("loom rejects analyze model subsets, programs, seconds, checkpoints") {
    val e1 = intercept[IllegalArgumentException] {
      bdb.execute("analyze lg model 0 for 1 iteration")
    }
    assert(e1.getMessage.contains("cannot analyze specific model numbers"))
    val e2 = intercept[IllegalArgumentException] {
      bdb.execute("analyze lg for 1 iteration (variables x)")
    }
    assert(e2.getMessage.contains("does not support programs"))
    val e3 = intercept[IllegalArgumentException] {
      bdb.execute("analyze lg for 2 seconds")
    }
    assert(e3.getMessage.contains("does not support number of seconds"))
    val e4 = intercept[IllegalArgumentException] {
      bdb.execute("analyze lg for 1 iteration checkpoint 1 iteration")
    }
    assert(e4.getMessage.contains("does not support checkpoint"))
  }

  test("loom rejects dropping specific models; full drop works") {
    // reference test_loom_complex_add_analyze_drop_sequence:103-106
    val e = intercept[IllegalArgumentException] {
      bdb.execute("drop model 1 from lg")
    }
    assert(e.getMessage.contains("cannot drop specific model numbers"))
  }

  test("predictive relevance: hypothetical rows rejected, existing rows work") {
    // reference test_loom_four_var:269-287
    val e = intercept[IllegalArgumentException] {
      bdb.execute("estimate predictive relevance" +
        " to hypothetical rows with values ((x = 50, xx = 100))" +
        " in the context of x from lp where rowid = 1").collect()
    }
    assert(e.getMessage.contains("hypothetical rows"))
    val rel = bdb.execute("estimate predictive relevance" +
      " to existing rows (rowid = 1) in the context of x" +
      " from lp where rowid = 1").collect().head.getDouble(0)
    assert(rel == 1.0, s"self-relevance must be 1, got $rel")
  }

  test("similarity: bounded by 1, self-similarity 1, one context column") {
    val sims = bdb.execute("estimate similarity in the context of x" +
      " from pairwise lp limit 2").collect()
    sims.foreach(r => assert(r.getDouble(2) <= 1.0))
    val self = one("estimate similarity of (rowid = 3) to (rowid = 3)" +
      " in the context of x by lp").asInstanceOf[Double]
    assert(self == 1.0)
    val (loom, st) = directState()
    val e = intercept[IllegalArgumentException] {
      loom.rowSimilarity(st, None, 1L, 2L, Seq(0, 1))
    }
    assert(e.getMessage.contains("exactly one context column"))
  }

  /** A small loom state fitted outside BQL, for trait-surface checks. */
  private def directState(): (LoomBackend, GeneratorState) = {
    val loom = new LoomBackend()
    val df = (1 to 30).map(i => (i.toDouble, 2.0 * i)).toDF("x", "xx")
    val st0 = loom.createGenerator(df.withColumn("rowid",
      org.apache.spark.sql.functions.monotonically_increasing_id() + 1),
      Map(0 -> "x", 1 -> "xx"), Set.empty)
    (loom, loom.initializeModels(st0, 0 until 4, DetRng(3L)))
  }

  test("dependence probability separates xx=2x from independent y") {
    val depXX = one("estimate dependence probability of x with xx by lp")
      .asInstanceOf[Double]
    val depY = one("estimate dependence probability of x with y by lp")
      .asInstanceOf[Double]
    assert(depXX > depY,
      s"dep(x,xx)=$depXX must exceed dep(x,y)=$depY")
    assert(depXX > 0.5, s"deterministic pair must co-assign, got $depXX")
    val depSelf = one("estimate dependence probability of x with x by lp")
      .asInstanceOf[Double]
    assert(depSelf == 1.0)
  }

  test("mutual information pools the ensemble into one estimate") {
    val (loom, st) = directState()
    val mi = loom.columnMutualInformation(st, None, Seq(0), Seq(1), Nil,
      numSamples = 20, rng = DetRng(7L))
    assert(mi.length == 1, s"loom MI must be a single pooled value, got $mi")
    // and it still flows through BQL
    val v = one("estimate mutual information of x with xx using 10 samples by lp")
      .asInstanceOf[Double]
    assert(v >= 0.0)
  }

  test("simulate given rowid conditions on cells; constraint overlap errors") {
    // loom_backend.py:764-770: constraint overriding an observed cell
    val e = intercept[IllegalArgumentException] {
      bdb.execute("simulate y from lp given rowid = 2, x = 3 limit 2").collect()
    }
    assert(e.getMessage.contains("Overlap between constraints and target row"))
    assert(bdb.execute("simulate y from lp given rowid = 2 limit 2").count() == 2)
  }

  test("two loom generators coexist on one population" +
      " (test_population_two_generators)") {
    val b = new BayesDB(spark, seed = 31L)
    b.registerTable("lt3", (1 to 20).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b.execute("create population lp3 for lt3 (id ignore; x numerical)")
    b.execute("create generator lg3a for lp3 using loom")
    b.execute("create generator lg3b for lp3 using loom")
    b.execute("initialize 2 models for lg3a")
    b.execute("initialize 3 models for lg3b")
    assert(b.execute("simulate x from lp3 modeled by lg3a limit 2").count() == 2)
    assert(b.execute("simulate x from lp3 modeled by lg3b limit 2").count() == 2)
  }

  test("initialize if-not-exists tops up, drop models resets" +
      " (test_loom_complex_add_analyze_drop_sequence)") {
    val b = new BayesDB(spark, seed = 37L)
    b.registerTable("lt4", (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    b.execute("create population lp4 for lt4 (id ignore; x numerical)")
    b.execute("create generator lg4 for lp4 using loom")
    b.execute("initialize 2 models for lg4")
    b.execute("initialize 3 models if not exists for lg4")
    // total is 3, not 2 + 3 (reference asserts num_models == 3)
    assert(b.catalog.modelNumbers("lg4").length == 3)
    b.execute("analyze lg4 for 2 iterations")
    def density(): Double =
      b.execute("estimate probability density of x = 5 by lp4")
        .collect().head.getDouble(0)
    assert(density() > 0.0)
    b.execute("drop models from lg4")
    // analysis starts fresh after a full drop
    b.execute("initialize 1 models for lg4")
    assert(b.catalog.modelNumbers("lg4").length == 1)
    b.execute("analyze lg4 for 5 iterations")
    assert(density() > 0.0)
  }

  /** Mixture of two well-separated bivariate gaussians
    * (test_loom_simulate_bivariate_gaussian.py): simulate must recover
    * the mix ratio, and conditioning on a partial observation must pull
    * the other coordinate to the right cluster. */
  private lazy val bivariateBdb: BayesDB = {
    val b = new BayesDB(spark, seed = 47L)
    val rng = new scala.util.Random(11)
    val rows = (1 to 150).map { i =>
      val c0 = rng.nextDouble() < 0.7
      val (mx, my) = if (c0) (0.0, 20.0) else (20.0, 0.0)
      (i.toLong, mx + rng.nextGaussian(), my + rng.nextGaussian())
    }
    b.registerTable("bg", rows.toDF("id", "x", "y"))
    b.execute("create population bgp for bg (id ignore; x numerical; y numerical)")
    b.execute("create generator bgg for bgp using loom")
    b.execute("initialize 4 models for bgg")
    b.execute("analyze bgg for 30 iterations")
    b
  }

  test("simulate recovers a two-cluster mix ratio" +
      " (test_loom_simulate_bivariate_gaussian: test_mix_ratio)") {
    val sim = bivariateBdb.execute("simulate x, y from bgp limit 200")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def d2(p: (Double, Double), m: (Double, Double)): Double = {
      val dx = p._1 - m._1; val dy = p._2 - m._2; dx * dx + dy * dy
    }
    val near0 = sim.count(p => d2(p, (0.0, 20.0)) < d2(p, (20.0, 0.0)))
    val ratio = near0.toDouble / sim.length
    assert(math.abs(ratio - 0.7) < 0.12, s"simulated mix ratio $ratio vs 0.7")
  }

  test("simulate conditions a fresh partial observation on the right cluster" +
      " (test_simulate_y_from_partially_populated_fresh_row)") {
    // the reference inserts (x=0, y=NULL) and simulates GIVEN rowid; for
    // loom that conditioning is cells-only, so GIVEN x = 0 is the same
    // computation
    val ys = bivariateBdb.execute("simulate y from bgp given x = 0 limit 100")
      .collect().map(_.getDouble(0))
    val mean = ys.sum / ys.length
    assert(mean > 12.0, s"y | x=0 must sit near the (0,20) cluster, got $mean")
  }

  test("infer explicit predict: numerical confidences are 0 (loom contract)") {
    // reference test_loom_four_var:345-351: all confidences == 0
    val rows = bdb.execute("infer explicit predict x confidence xc from lp limit 5")
      .collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getDouble(1) == 0.0))
  }

  test("loom lifecycle over every stattype (test_stattypes)") {
    // reference test_loom_backend.py:144-197: a table with
    // unbounded_nominal, counts, boolean, nominal, cyclic, numerical
    // through create/initialize/analyze/density/simulate/drop — the
    // reference only checks for errors; we also sanity the outputs
    val b = new BayesDB(spark, seed = 31L)
    val rng = new scala.util.Random(7)
    val cats = Array("a", "b", "c")
    b.registerTable("st", (1 to 40).map { i =>
      (i.toLong, cats(rng.nextInt(3)), rng.nextInt(200).toDouble,
        rng.nextInt(2).toDouble, cats(rng.nextInt(3)),
        rng.nextInt(1000) / 4.0, rng.nextInt(1000) / 4.0 - 100.0,
        rng.nextInt(1000) / 4.0)
    }.toDF("id", "u", "co", "b", "ca", "cy", "nu", "no"))
    b.execute("""create population sp for st (
      id ignore;
      u unbounded_nominal;
      co counts;
      b boolean;
      ca nominal;
      cy cyclic;
      nu numerical;
      no numerical)""")
    b.execute("create generator sg for sp using loom")
    b.execute("initialize 1 models for sg")
    b.execute("analyze sg for 5 iterations")
    val d = b.execute(
      "estimate probability density of (nu = 50) given (co = 2) by sp")
      .collect().head.getDouble(0)
    assert(d >= 0.0 && !d.isNaN)
    assert(b.execute("simulate u, co, b, ca, cy, nu, no from sp limit 1")
      .count() == 1)
    assert(b.execute("simulate u, ca from sp given nu = 3, co = 2 limit 1")
      .count() == 1)
    b.execute("drop models from sg")
    b.execute("drop generator sg")
    b.execute("drop population sp")
    b.execute("drop table st")
  }

  test("loom handles a nominal with 300 distinct values (guess-schema case)") {
    // reference test_loom_guess_schema_nominal:199-231: >256 distinct
    // values would overflow loom's bounded nominal; the adapter treats
    // it as unbounded — here the lifecycle must simply run clean
    val b = new BayesDB(spark, seed = 37L)
    val rng = new scala.util.Random(11)
    b.registerTable("wt", (1 to 300).map { i =>
      (i.toLong, (0 until 20).map(_ => ('a' + rng.nextInt(26)).toChar).mkString)
    }.toDF("id", "v"))
    b.execute("create population wp for wt (id ignore; v nominal)")
    b.execute("create generator wg for wp using loom")
    b.execute("initialize 1 models for wg")
    b.execute("analyze wg for 3 iterations")
    assert(b.execute("simulate v from wp limit 2").count() == 2)
    b.execute("drop models from wg")
    b.execute("drop generator wg")
  }
}
