package graft

import graft.bql.BayesDB
import org.scalatest.funsuite.AnyFunSuite

/** cgpm LATENT + OVERRIDE GENERATIVE MODEL composition (reference:
  * tests/test_cgpm.py:180-310, 585-660; schema grammar
  * src/backends/cgpm_schema/grammar.y). A linreg node models y given x
  * on top of the baseline CrossCat; a factor-analysis node exposes its
  * latent factor score as a queryable variable. */
class CompositionSpec extends AnyFunSuite {
  import TestSpark._

  // y = 2x + 1 + noise; z independent of both; u, v share a factor
  private lazy val bdb: BayesDB = {
    val b = new BayesDB(spark, seed = 21L)
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (1 to 250).map { i =>
      val x = rng.nextGaussian() * 3.0
      val y = 2.0 * x + 1.0 + rng.nextGaussian() * 0.5
      val z = 50.0 + rng.nextGaussian() * 2.0
      val f = rng.nextGaussian()
      val u = 3.0 * f + rng.nextGaussian() * 0.3
      val v = -2.0 * f + 10.0 + rng.nextGaussian() * 0.3
      (i.toLong, x, y, z, u, v)
    }
    b.registerTable("tc", rows.toDF("id", "x", "y", "z", "u", "v"))
    b.execute("create population pc for tc (id ignore;" +
      " x numerical; y numerical; z numerical; u numerical; v numerical)")
    b.execute("""create generator gc for pc using cgpm (
      override model for y given x using linreg;
      latent fscore numerical;
      override model for u, v, fscore using factor_analysis(l=1)
    )""")
    b.execute("initialize 2 models for gc")
    b.execute("analyze gc for 3 iterations")
    b
  }

  private def simMean(sql: String): Double = {
    val vals = bdb.execute(sql).collect().map(_.getDouble(0))
    vals.sum / vals.length
  }

  test("linreg node: conditional simulate tracks the regression line") {
    val hi = simMean("simulate y from pc given x = 5 limit 80")
    val lo = simMean("simulate y from pc given x = -5 limit 80")
    assert(math.abs(hi - 11.0) < 2.5, s"E[y|x=5] should be ~11, got $hi")
    assert(math.abs(lo - (-9.0)) < 2.5, s"E[y|x=-5] should be ~-9, got $lo")
  }

  test("linreg node: density peaks near the regression line") {
    val near = bdb.execute(
      "estimate probability density of y = 11 given (x = 5) by pc")
      .collect().head.getDouble(0)
    val far = bdb.execute(
      "estimate probability density of y = -9 given (x = 5) by pc")
      .collect().head.getDouble(0)
    assert(near > far,
      s"density near the line ($near) must beat far ($far)")
  }

  test("network dependence: foreign outputs inherit their inputs' structure") {
    def dep(a: String, b: String): Double = bdb.execute(
      s"estimate dependence probability of $a with $b by pc")
      .collect().head.getDouble(0)
    assert(dep("y", "x") == 1.0, "y is modeled given x: dependent")
    assert(dep("u", "v") == 1.0, "u, v share a factor-analysis node")
    assert(dep("fscore", "u") == 1.0, "latent factor is dependent with its node outputs")
    // y's dependence on z equals x's (inherited through the input)
    assert(dep("y", "z") == dep("x", "z"))
  }

  test("latent factor score simulates and separates the factor direction") {
    // u = 3f + e: high u ⇒ high factor; v = -2f + 10 + e: high u pairs
    // with low v. Condition on opposite u values and check fscore moves.
    val hi = simMean("simulate fscore from pc given u = 6 limit 60")
    val lo = simMean("simulate fscore from pc given u = -6 limit 60")
    assert(hi != lo, "factor must respond to evidence on u")
    assert(math.abs(hi - lo) > 0.5,
      s"factor posterior barely moved: $hi vs $lo")
    // conditioning on a foreign output (u) flows to its sibling (v)
    val vHi = simMean("simulate v from pc given u = 6 limit 60")
    val vLo = simMean("simulate v from pc given u = -6 limit 60")
    assert(vHi < vLo, s"v anti-correlates with u: E[v|u=6]=$vHi, E[v|u=-6]=$vLo")
  }

  test("latents appear in ESTIMATE FROM VARIABLES OF only when their generator is named") {
    // reference core.py:335-343: `generator_id IS NULL OR generator_id = ?`
    // — an UNSCOPED query sees manifest variables only; naming the
    // latent's generator (MODELED BY) reveals it
    val unscoped = bdb.execute("estimate * from variables of pc")
      .collect().map(_.getString(0)).toSet
    assert(unscoped == Set("x", "y", "z", "u", "v"))
    val scoped = bdb.execute("estimate * from variables of pc modeled by gc")
      .collect().map(_.getString(0)).toSet
    assert(scoped == Set("x", "y", "z", "u", "v", "fscore"))
    // a second, plain generator on the same population does not see fscore
    bdb.execute("create generator gplain for pc using cgpm (subsample 100)")
    bdb.execute("initialize 1 models for gplain")
    bdb.execute("analyze gplain for 1 iteration")
    val plain = bdb.execute("estimate * from variables of pc modeled by gplain")
      .collect().map(_.getString(0)).toSet
    assert(plain == Set("x", "y", "z", "u", "v"))
  }

  test("pairwise dependence over a latent-bearing population runs") {
    val df = bdb.execute(
      "estimate dependence probability from pairwise variables of pc modeled by gc")
    assert(df.count() == 36)  // 6 visible variables
  }

  test("mutual information through a foreign node is positive") {
    val mi = bdb.execute(
      "estimate mutual information of y with x using 80 samples by pc")
      .collect().head.getDouble(0)
    assert(mi > 0.2, s"MI(y, x) through linreg should be clearly positive: $mi")
  }

  test("schema errors: duplicate latent, unknown variable, cycle, nominal FA") {
    val e1 = intercept[IllegalArgumentException] { bdb.execute(
      """create generator gd for pc using cgpm (
        latent pc2 numerical;
        override model for u and expose pc2 numerical using factor_analysis(l=1)
      )""") }
    assert(e1.getMessage.toLowerCase.contains("duplicate latent"))
    intercept[Exception] { bdb.execute(
      "create generator ge for pc using cgpm (override model for nosuch using linreg)") }
    // nominal latent rejected when the predictor is fit (INITIALIZE),
    // matching the reference's ValueError timing
    bdb.execute(
      """create generator gn for pc using cgpm (
        override model for u and expose pcn nominal using factor_analysis(l=1)
      )""")
    val e2 = intercept[IllegalArgumentException] {
      bdb.execute("initialize 1 models for gn") }
    assert(e2.getMessage.contains("numerical"))
  }

  test("chained foreign nodes: linreg on a linreg output simulates through") {
    // w given y, y given x — the network realizes y before w
    val b2 = new BayesDB(spark, seed = 22L)
    import spark.implicits._
    val rng = new scala.util.Random(9)
    val rows = (1 to 150).map { i =>
      val x = rng.nextGaussian() * 2.0
      val y = 2.0 * x + rng.nextGaussian() * 0.3
      val w = -1.0 * y + 5.0 + rng.nextGaussian() * 0.3
      (i.toLong, x, y, w)
    }
    b2.registerTable("tch", rows.toDF("id", "x", "y", "w"))
    b2.execute("create population pch for tch (id ignore;" +
      " x numerical; y numerical; w numerical)")
    b2.execute("""create generator gch for pch using cgpm (
      override model for w given y using linreg;
      override model for y given x using linreg
    )""")
    b2.execute("initialize 2 models for gch")
    b2.execute("analyze gch for 2 iterations")
    def mean(sql: String): Double = {
      val v = b2.execute(sql).collect().map(_.getDouble(0)); v.sum / v.length
    }
    // E[w | x=3] = -(2*3) + 5 = -1
    val m = mean("simulate w from pch given x = 3 limit 80")
    assert(math.abs(m - (-1.0)) < 1.5, s"E[w|x=3] should be ~-1, got $m")
    assert(b2.execute("estimate dependence probability of w with x by pch")
      .collect().head.getDouble(0) == 1.0, "w depends on x through the chain")
  }

  test("USING MODELS restriction flows through the network") {
    val one = bdb.execute(
      "simulate y from pc modeled by gc using model 0 given x = 5 limit 40")
      .collect().map(_.getDouble(0))
    val other = bdb.execute(
      "simulate y from pc modeled by gc using model 1 given x = 5 limit 40")
      .collect().map(_.getDouble(0))
    assert(one.toSeq != other.toSeq,
      "per-model linreg posterior draws must differ between models")
  }

  test("predictive probability of a latent cell is NULL (no observed value)") {
    val df = bdb.execute(
      "estimate predictive probability of fscore from pc modeled by gc limit 3")
    assert(df.collect().forall(_.isNullAt(0)),
      "latent cells have no observed value; reference yields NULL")
  }

  test("network density given full inputs equals the analytic predictive exactly") {
    // with every input of the linreg node constrained, the likelihood
    // weighting degenerates: each sample scores the same analytic
    // Student-t, so the network density must match it to the bit
    val pm = bdb.populationModel("pc", Some("gc"))
    val gen = pm.generators.head
    val st = gen.state.asInstanceOf[graft.backends.CrossCat.CrossCatState]
    val yC = pm.colno("y"); val xC = pm.colno("x")
    val li = st.foreignSpecs.indexWhere(_.predictor == "linreg")
    st.models.foreach { m =>
      val lr = m.foreign(li).asInstanceOf[graft.backends.ForeignCgpm.LinReg]
      val direct = lr.logpdf(Seq(yC -> 11.0), Seq(xC -> 5.0))
      val viaNetwork = gen.backend.logpdfJoint(
        st, Some(Seq(m.modelno)), Seq(yC -> 11.0), Seq(xC -> 5.0))
      assert(math.abs(viaNetwork - direct) < 1e-9,
        s"model ${m.modelno}: network $viaNetwork vs analytic $direct")
    }
  }

  test("save/open round-trips a composed generator") {
    val dir = java.nio.file.Files.createTempDirectory("graft_comp_persist").toString
    bdb.save(dir)
    val reopened = BayesDB.open(spark, dir)
    val dep = reopened.execute(
      "estimate dependence probability of y with x by pc modeled by gc")
      .collect().head.getDouble(0)
    assert(dep == 1.0, "composition structure must survive persistence")
    val sim = reopened.execute("simulate fscore from pc modeled by gc limit 5")
    assert(sim.count() == 5, "latent simulation must survive persistence")
  }

  test("infer and predict on a foreign output work end to end") {
    val inferred = bdb.execute(
      "infer explicit predict y confidence yc from pc limit 5")
    assert(inferred.count() == 5)
    val preds = bdb.execute("estimate predict y with confidence 0 from pc limit 3")
    assert(preds.count() == 3)
  }

  test("INFER on a foreign output tracks the regression line (value pin)") {
    // b24's semantics at unit scale: PREDICT y conditions on each row's
    // observed x through the linreg node, so the imputed value must track
    // 2x+1 — not the marginal mean (which a marginal-draw bug would give)
    // MODELED BY gc: an earlier case attaches a second (plain) generator
    // to pc, and an unscoped PREDICT picks a random generator per row
    // (reference: bql_predict chooses among the population's generators)
    val rows = bdb.execute(
      "infer explicit x, predict y as y_hat using 16 samples from pc modeled by gc where rowid <= 40 order by rowid")
      .collect()
    val errs = rows.map { r =>
      math.abs(r.getDouble(1) - (2.0 * r.getDouble(0) + 1.0)) }
    val mae = errs.sum / errs.length
    assert(mae < 1.0, s"mean |y_hat - (2x+1)| = $mae; y_hat must condition on x")
    // and it must beat the marginal: average |marginal mean - (2x+1)|
    val yMean = bdb.execute("select avg(y) from tc").collect().head.getDouble(0)
    val marginalMae = rows.map(r => math.abs(yMean - (2.0 * r.getDouble(0) + 1.0))).sum / rows.length
    assert(mae < marginalMae / 2,
      s"conditioned MAE $mae should be far below marginal MAE $marginalMae")
  }

  test("foreign-output given conditions an incorporated-row simulate") {
    // SIMULATE x GIVEN rowid, y=c: y is a foreign (linreg) output whose
    // input is x, so the given must inform the x draw — the network path
    // reweights cluster-conditioned proposals by the linreg likelihood
    // (previously the given was validated then silently dropped).
    val hi = simMean("simulate x from pc modeled by gc given rowid = 1, y = 25 limit 60")
    val lo = simMean("simulate x from pc modeled by gc given rowid = 1, y = -25 limit 60")
    assert(hi > lo + 0.5,
      s"y=25 implies x~12, y=-25 implies x~-13; got E[x|y=25]=$hi <= E[x|y=-25]=$lo")
  }

  test("SIMULATE ... ACCURACY widens the foreign-constraint importance pool") {
    // ACCURACY n (reference: src/backend.py:263-266 → simulate_joint's
    // accuracy argument) multiplies the network sampler's proposal
    // width. The token must CHANGE the draw (same seed, different
    // proposal pool → different resampled values), and the conditioning
    // direction must survive at high accuracy.
    val base = bdb.execute("simulate x from pc modeled by gc given y = 25 limit 40")
      .collect().map(_.getDouble(0)).toSeq
    val sharp = bdb.execute("simulate x from pc modeled by gc given y = 25 limit 40 accuracy 8")
      .collect().map(_.getDouble(0)).toSeq
    assert(base != sharp,
      "ACCURACY 8 must change the importance-resampled draw, not be dropped")
    val hi = simMean("simulate x from pc modeled by gc given y = 25 limit 60 accuracy 8")
    val lo = simMean("simulate x from pc modeled by gc given y = -25 limit 60 accuracy 8")
    assert(hi > lo + 0.5,
      s"conditioning direction must hold under ACCURACY: $hi <= $lo")
    // determinism: the same ACCURACY query replays bit-identically
    val again = bdb.execute("simulate x from pc modeled by gc given y = 25 limit 40 accuracy 8")
      .collect().map(_.getDouble(0)).toSeq
    assert(sharp == again, "ACCURACY draw must be seed-deterministic")
    // exact samplers ignore ACCURACY (reference nig_normal does too):
    // no foreign column touched → identical draw with and without it
    val exact0 = bdb.execute("simulate z from pc modeled by gc limit 20")
      .collect().map(_.getDouble(0)).toSeq
    val exact1 = bdb.execute("simulate z from pc modeled by gc limit 20 accuracy 8")
      .collect().map(_.getDouble(0)).toSeq
    assert(exact0 == exact1,
      "ACCURACY must be a no-op on the exact baseline draw")
    val err = intercept[IllegalArgumentException](
      bdb.execute("simulate x from pc modeled by gc limit 5 accuracy 0"))
    assert(err.getMessage.contains("ACCURACY"))
  }
}
