package graft

import graft.functions.SpecialMath._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the special functions with closed-form identities rather than
  * library-derived constants — stronger than goldens and scipy-free:
  *  χ²(2df) sf(x)   = exp(-x/2)
  *  χ²(4df) sf(x)   = (1 + x/2) exp(-x/2)
  *  t(1df)  cdf(x)  = 1/2 + atan(x)/π
  *  t(2df)  cdf(x)  = 1/2 + x / (2 sqrt(2 + x²))
  *  F(2,d)  sf(x)   = (1 + 2x/d)^(-d/2)
  *  erf(1)          = 0.842700792949715 (classical)
  */
class SpecialMathSpec extends AnyFunSuite {

  private val Tol = 1e-12

  private def close(a: Double, b: Double, tol: Double = Tol): Boolean =
    if (a.isNaN || b.isNaN) a.isNaN == b.isNaN
    else math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("lgamma matches factorials and half-integer closed forms") {
    assert(close(lgamma(1.0), 0.0))
    assert(close(lgamma(5.0), math.log(24.0)))
    assert(close(lgamma(11.0), math.log(3628800.0)))
    assert(close(lgamma(0.5), 0.5 * math.log(math.Pi)))
    assert(close(lgamma(1.5), math.log(math.sqrt(math.Pi) / 2.0)))
  }

  test("chi2Sf closed forms at df=2 and df=4") {
    for (x <- Seq(0.1, 0.5, 1.0, 2.0, 5.0, 12.5, 50.0, 250.0)) {
      assert(close(chi2Sf(x, 2.0), math.exp(-x / 2.0)), s"df=2 x=$x")
      assert(close(chi2Sf(x, 4.0), (1.0 + x / 2.0) * math.exp(-x / 2.0)), s"df=4 x=$x")
    }
    assert(chi2Sf(-1.0, 3.0) == 1.0)
    assert(chi2Sf(0.0, 3.0) == 1.0)
  }

  test("gamma below/above are complements and hit boundary values") {
    for (a <- Seq(0.3, 0.5, 1.0, 2.5, 10.0); x <- Seq(0.0, 0.2, 1.0, 3.0, 15.0)) {
      val lo = gammaBelow(a, x)
      val hi = gammaAbove(a, x)
      assert(lo >= 0 && lo <= 1 && hi >= 0 && hi <= 1, s"range a=$a x=$x")
      assert(close(lo + hi, 1.0, 1e-13), s"complement a=$a x=$x: $lo + $hi")
    }
    assert(gammaBelow(2.0, 0.0) == 0.0)
    // Q(1, x) = exp(-x)
    for (x <- Seq(0.5, 2.0, 10.0))
      assert(close(gammaAbove(1.0, x), math.exp(-x)), s"Q(1,$x)")
  }

  test("tCdf closed forms at df=1 (Cauchy) and df=2") {
    for (x <- Seq(-30.0, -2.5, -0.5, 0.0, 0.5, 2.5, 30.0)) {
      assert(close(tCdf(x, 1.0), 0.5 + math.atan(x) / math.Pi), s"df=1 x=$x")
      assert(close(tCdf(x, 2.0), 0.5 + x / (2.0 * math.sqrt(2.0 + x * x))), s"df=2 x=$x")
    }
    assert(tCdf(0.0, 7.0) == 0.5)
    // symmetry: cdf(-x) = 1 - cdf(x)
    for (df <- Seq(3.0, 10.0, 100.0); x <- Seq(0.7, 1.9, 4.2))
      assert(close(tCdf(-x, df), 1.0 - tCdf(x, df)), s"symmetry df=$df x=$x")
  }

  test("fSf closed form at dfNum=2 and reciprocal identity") {
    for (d <- Seq(1.0, 3.0, 10.0, 100.0); x <- Seq(0.3, 1.0, 3.2, 8.0))
      assert(close(fSf(x, 2.0, d), math.pow(1.0 + 2.0 * x / d, -d / 2.0)), s"F(2,$d) x=$x")
    // P(F_{a,b} > x) = P(F_{b,a} < 1/x)
    for (x <- Seq(0.5, 2.0, 5.0))
      assert(close(fSf(x, 4.0, 7.0), 1.0 - fSf(1.0 / x, 7.0, 4.0), 1e-11), s"recip x=$x")
    assert(fSf(0.0, 3.0, 5.0) == 1.0)
    assert(fSf(-1.0, 3.0, 5.0) == 1.0)
  }

  test("incBeta symmetry and uniform special case") {
    // I_x(1,1) = x
    for (x <- Seq(0.1, 0.37, 0.9)) assert(close(incBeta(x, 1.0, 1.0), x))
    // I_x(a,b) = 1 - I_{1-x}(b,a)
    for (x <- Seq(0.2, 0.5, 0.77); a <- Seq(0.5, 2.0, 9.0); b <- Seq(1.5, 4.0))
      assert(close(incBeta(x, a, b), 1.0 - incBeta(1.0 - x, b, a), 1e-12),
        s"symmetry x=$x a=$a b=$b")
  }

  test("erf/erfc classical values and complement") {
    assert(close(erf(1.0), 0.8427007929497149, 1e-12))
    assert(close(erf(2.0), 0.9953222650189527, 1e-12))
    assert(erf(0.0) == 0.0 && erfc(0.0) == 1.0)
    for (x <- Seq(-2.0, -0.3, 0.4, 1.7))
      assert(close(erf(x) + erfc(x), 1.0), s"complement x=$x")
    assert(close(erf(-1.0), -erf(1.0)))
  }

  test("logSumExp / logMeanExp reference edge semantics") {
    assert(logSumExp(Array.empty) == Double.NegativeInfinity)
    assert(close(logSumExp(Array(math.log(2.0), math.log(3.0))), math.log(5.0)))
    assert(logSumExp(Array(Double.NegativeInfinity, Double.NegativeInfinity))
      == Double.NegativeInfinity)
    assert(logSumExp(Array(Double.PositiveInfinity, 1.0)) == Double.PositiveInfinity)
    assert(logSumExp(Array(Double.PositiveInfinity, Double.NegativeInfinity)).isNaN)
    assert(logSumExp(Array(1.0, Double.NaN)).isNaN)
    // no overflow for huge inputs
    assert(close(logSumExp(Array(1000.0, 1000.0)), 1000.0 + math.log(2.0)))
    // logMeanExp: -inf contributes 0 to sum, 1 to count
    assert(close(logMeanExp(Array(math.log(4.0), Double.NegativeInfinity)), math.log(2.0)))
    assert(logMeanExp(Array.empty) == Double.NegativeInfinity)
  }

  test("logAvgExpWeighted is a weighted average in log space") {
    // W = (1, 3), A = (2, 6) → (1*2 + 3*6)/4 = 5
    val got = logAvgExpWeighted(
      Array(math.log(1.0), math.log(3.0)), Array(math.log(2.0), math.log(6.0)))
    assert(close(got, math.log(5.0)))
  }
}
