package graft

import graft.backends.{DetRng, ForeignCgpm}
import graft.backends.ForeignCgpm.{ForeignSpec, LinReg, FactorAnalysis, Lin}
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level math checks for the foreign predictors: the conjugate
  * linear-regression posterior against the closed-form ridge solution,
  * the factor-analysis EM against the data covariance, and the small
  * linear-algebra kernel against identities. */
class ForeignCgpmSpec extends AnyFunSuite {

  test("Lin.solve and Lin.invLogDet satisfy matrix identities") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.2),
      Array(0.5, 0.2, 2.0))
    val b = Array(1.0, 2.0, 3.0)
    val x = Lin.solve(a.map(_.clone()), b)
    // A x = b
    val ax = a.map(row => row.zip(x).map { case (p, q) => p * q }.sum)
    ax.zip(b).foreach { case (got, want) => assert(math.abs(got - want) < 1e-10) }
    val (inv, logdet) = Lin.invLogDet(a.map(_.clone()))
    // A·A⁻¹ = I
    for (i <- 0 until 3; j <- 0 until 3) {
      var s = 0.0
      for (k <- 0 until 3) s += a(i)(k) * inv(k)(j)
      assert(math.abs(s - (if (i == j) 1.0 else 0.0)) < 1e-10, s"($i,$j)=$s")
    }
    // det by cofactor expansion for the 3x3
    val det =
      4.0 * (3.0 * 2.0 - 0.2 * 0.2) - 1.0 * (1.0 * 2.0 - 0.2 * 0.5) +
        0.5 * (1.0 * 0.2 - 3.0 * 0.5)
    assert(math.abs(logdet - math.log(det)) < 1e-10)
  }

  test("linreg posterior mean equals the closed-form ridge solution") {
    // y = 3 + 2x over a grid; λ=1 ridge on [1, x]
    val xs = (0 until 50).map(i => i / 5.0 - 5.0)
    val ys = xs.map(x => 3.0 + 2.0 * x)
    val spec = ForeignSpec("linreg", Seq(10), Seq(0), Set.empty, Map.empty)
    val data = Map(0 -> xs.toArray, 10 -> ys.toArray)
    val lr = ForeignCgpm.fit(spec, data, Map(0 -> 1), DetRng(5L))
      .asInstanceOf[LinReg]
    // closed form: (XᵀX + I)⁻¹ Xᵀy with X = [1, x]
    val n = xs.length.toDouble
    val sx = xs.sum; val sxx = xs.map(x => x * x).sum
    val sy = ys.sum; val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val a11 = n + 1; val a12 = sx; val a22 = sxx + 1
    val det = a11 * a22 - a12 * a12
    val b0 = (a22 * sy - a12 * sxy) / det
    val b1 = (a11 * sxy - a12 * sy) / det
    assert(math.abs(lr.betaMean(0) - b0) < 1e-8, s"intercept ${lr.betaMean(0)} vs $b0")
    assert(math.abs(lr.betaMean(1) - b1) < 1e-8, s"slope ${lr.betaMean(1)} vs $b1")
    // predictive density peaks at the fitted line
    val onLine = lr.logpdf(Seq(10 -> (3.0 + 2.0 * 1.5)), Seq(0 -> 1.5))
    val offLine = lr.logpdf(Seq(10 -> (3.0 + 2.0 * 1.5 + 5.0)), Seq(0 -> 1.5))
    assert(onLine > offLine)
    // posterior draw simulates near its own line
    val draws = (1 to 200).map(i =>
      lr.simulate(Seq(10), Seq(0 -> 2.0), DetRng(9L, i.toLong)).head)
    val mean = draws.sum / draws.length
    assert(math.abs(mean - (3.0 + 2.0 * 2.0)) < 1.0, s"E[y|x=2] ≈ 7, got $mean")
  }

  test("linreg one-hot codes nominal inputs") {
    // y = 10·[cat=1] + 1, cat ∈ {0,1,2} coded
    val cats = (0 until 60).map(i => (i % 3).toDouble)
    val ys = cats.map(c => 1.0 + (if (c == 1.0) 10.0 else 0.0))
    val spec = ForeignSpec("linreg", Seq(5), Seq(1), Set.empty, Map.empty)
    val lr = ForeignCgpm.fit(spec,
      Map(1 -> cats.toArray, 5 -> ys.toArray), Map(1 -> 3), DetRng(7L))
      .asInstanceOf[LinReg]
    def predMean(c: Double): Double = {
      // analytic predictive mean at the design point
      val draws = (1 to 300).map(i =>
        lr.simulate(Seq(5), Seq(1 -> c), DetRng(11L, i.toLong)).head)
      draws.sum / draws.length
    }
    assert(math.abs(predMean(1.0) - 11.0) < 0.8, s"cat 1 → ~11, got ${predMean(1.0)}")
    assert(math.abs(predMean(0.0) - 1.0) < 0.8, s"cat 0 → ~1, got ${predMean(0.0)}")
  }

  test("factor analysis recovers the shared-factor covariance") {
    val rng = new scala.util.Random(3)
    val n = 400
    val fs = Array.fill(n)(rng.nextGaussian())
    val u = fs.map(f => 2.0 * f + 0.2 * rng.nextGaussian())
    val v = fs.map(f => -1.5 * f + 0.2 * rng.nextGaussian())
    val spec = ForeignSpec("factor_analysis", Seq(1, 2, -1), Nil, Set(-1),
      Map("l" -> "1"))
    val fa = ForeignCgpm.fit(spec, Map(1 -> u, 2 -> v), Map.empty, DetRng(13L))
      .asInstanceOf[FactorAnalysis]
    // model covariance W Wᵀ + Ψ vs the sample covariance
    val covModel = fa.w(0)(0) * fa.w(1)(0)
    val mu0 = u.sum / n; val mu1 = v.sum / n
    val covData = u.zip(v).map { case (a, b) => (a - mu0) * (b - mu1) }.sum / n
    assert(math.abs(covModel - covData) < 0.4,
      s"cross covariance: model $covModel vs data $covData")
    // conditioning on u moves the latent factor in the loading's direction
    val zHi = fa.simulate(Seq(-1), Seq(1 -> 4.0), DetRng(17L))
    val zLo = fa.simulate(Seq(-1), Seq(1 -> -4.0), DetRng(17L))
    assert((zHi.head - zLo.head) * fa.w(0)(0) > 0,
      "factor must move with the evidence along the loading sign")
    // density of the anti-correlated pair beats the positively-correlated one
    val anti = fa.logpdf(Seq(1 -> 2.0, 2 -> -1.5), Nil)
    val co = fa.logpdf(Seq(1 -> 2.0, 2 -> 1.5), Nil)
    assert(anti > co, s"anti-correlated pair should be likelier: $anti vs $co")
  }

  test("registry rejects unknown predictors and bad shapes") {
    intercept[IllegalArgumentException] {
      ForeignCgpm.fit(ForeignSpec("mystery", Seq(1), Nil, Set.empty, Map.empty),
        Map.empty, Map.empty, DetRng(1L))
    }
    intercept[IllegalArgumentException] {
      ForeignCgpm.validate(
        ForeignSpec("linreg", Seq(1, 2), Nil, Set.empty, Map.empty), _ => false)
    }
    intercept[IllegalArgumentException] {
      ForeignCgpm.validate(
        ForeignSpec("factor_analysis", Seq(1), Seq(2), Set.empty, Map.empty),
        _ => false)
    }
  }
}
