package graft.functions

/** Scipy-free special functions needed by the CORRELATION PVALUE family
  * and log-space ensemble averaging (reference: src/math_util.py,
  * src/stats.py:123-155). Fresh implementations of the standard public
  * algorithms: Lanczos log-gamma, regularized incomplete gamma by power
  * series + Lentz continued fraction (NIST DLMF 8.7.1, A&S 6.5.31), and
  * regularized incomplete beta by Lentz continued fraction (A&S 26.5.8).
  *
  * All functions are pure and allocation-free — safe to call inside
  * Spark expressions/UDFs on executors.
  */
object SpecialMath {

  private val Eps = 1e-15
  private val FpMin = Double.MinPositiveValue / Eps

  /** log Γ(x) for x > 0 — Lanczos approximation (g=7, n=9), the standard
    * public coefficient set; |rel err| < 1e-13 over the positive axis. */
  def lgamma(x: Double): Double = {
    if (x.isNaN || x <= 0.0) {
      if (x == 0.0) Double.PositiveInfinity else Double.NaN
    } else if (x < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lgamma(1.0 - x)
    } else {
      val g = 7.0
      val c = Array(
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x) ∈ [0, 1]. */
  def gammaBelow(a: Double, x: Double): Double = {
    require(a > 0.0, s"gammaBelow: a must be positive, got $a")
    require(x >= 0.0, s"gammaBelow: x must be nonnegative, got $x")
    if (x == 0.0) 0.0
    else if (x > math.max(1.0, a)) 1.0 - gammaAbove(a, x)
    else {
      // power series: P(a,x) = x^a e^-x / Γ(a+1) * Σ_k x^k / ((a+1)...(a+k))
      val logM = a * math.log(x) - x - lgamma(a)
      if (logM < -700.0) 0.0
      else {
        var term = 1.0
        var sum = 1.0
        var k = 1
        while (term / sum > Eps && k < 10000) {
          term *= x / (a + k)
          sum += term
          k += 1
        }
        math.exp(logM) / a * sum
      }
    }
  }

  /** Regularized upper incomplete gamma Q(a, x) = 1 - P(a, x). */
  def gammaAbove(a: Double, x: Double): Double = {
    require(a > 0.0, s"gammaAbove: a must be positive, got $a")
    require(x >= 0.0, s"gammaAbove: x must be nonnegative, got $x")
    if (x <= math.max(1.0, a)) 1.0 - gammaBelow(a, x)
    else {
      // Lentz's algorithm on the continued fraction (A&S 6.5.31):
      // Q(a,x) = m * 1/(x+1-a- 1*(1-a)/(x+3-a- 2*(2-a)/(x+5-a- ...)))
      val logM = a * math.log(x) - x - lgamma(a)
      if (logM < -700.0) 0.0
      else {
        var b = x + 1.0 - a
        var c = 1.0 / FpMin
        var d = 1.0 / b
        var h = d
        var i = 1
        var del = 0.0
        do {
          val an = -i * (i - a)
          b += 2.0
          d = an * d + b
          if (math.abs(d) < FpMin) d = FpMin
          c = b + an / c
          if (math.abs(c) < FpMin) c = FpMin
          d = 1.0 / d
          del = d * c
          h *= del
          i += 1
        } while (math.abs(del - 1.0) > Eps && i < 10000)
        math.exp(logM) * h
      }
    }
  }

  /** Continued fraction for the regularized incomplete beta (A&S 26.5.8,
    * evaluated with Lentz's method). */
  private def betacf(x: Double, a: Double, b: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < FpMin) d = FpMin
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < FpMin) d = FpMin
      c = 1.0 + aa / c
      if (math.abs(c) < FpMin) c = FpMin
      d = 1.0 / d
      del = d * c
      h *= del
      m += 1
    } while (math.abs(del - 1.0) > Eps && m < 10000)
    h
  }

  /** Regularized incomplete beta I_x(a, b) ∈ [0, 1]. */
  def incBeta(x: Double, a: Double, b: Double): Double = {
    require(a > 0.0 && b > 0.0, s"incBeta: a,b must be positive, got $a,$b")
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val logFront = lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log1p(-x)
      val front = math.exp(logFront)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(x, a, b) / a
      else 1.0 - math.exp(lgamma(a + b) - lgamma(b) - lgamma(a) +
        b * math.log1p(-x) + a * math.log(x)) * betacf(1.0 - x, b, a) / b
    }
  }

  /** Student's t CDF: P(T_df < x) (reference: src/stats.py:123-133). */
  def tCdf(x: Double, df: Double): Double = {
    require(df > 0.0, s"tCdf: df must be positive, got $df")
    if (x.isNaN) Double.NaN
    else if (x == 0.0) 0.5
    else {
      val tail = 0.5 * incBeta(df / (df + x * x), df / 2.0, 0.5)
      if (x < 0.0) tail else 1.0 - tail
    }
  }

  /** χ² survival function: P(X²_df > x) (reference: src/stats.py:135-143). */
  def chi2Sf(x: Double, df: Double): Double = {
    require(df > 0.0, s"chi2Sf: df must be positive, got $df")
    if (x < 0.0) 1.0 else gammaAbove(df / 2.0, x / 2.0)
  }

  /** F survival function: P(F_{d1,d2} > x) (reference: src/stats.py:145-155). */
  def fSf(x: Double, dfNum: Double, dfDen: Double): Double = {
    require(dfNum > 0.0 && dfDen > 0.0,
      s"fSf: degrees of freedom must be positive, got $dfNum,$dfDen")
    if (x <= 0.0) 1.0
    else incBeta(dfDen / (dfDen + dfNum * x), dfDen / 2.0, dfNum / 2.0)
  }

  /** Error function (reference exposes erf/erfc as SQL UDFs,
    * src/bqlmath.py:20-52) — via the incomplete gamma. */
  def erf(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x == 0.0) 0.0
    else math.signum(x) * gammaBelow(0.5, x * x)

  def erfc(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x >= 0.0) { if (x == 0.0) 1.0 else gammaAbove(0.5, x * x) }
    else 2.0 - erfc(-x)

  // ---- log-space ensemble averaging (reference: src/math_util.py:57-114) --

  /** log Σ exp(a_i); -inf on empty input; +inf-dominant and NaN-propagating
    * exactly as the reference. */
  /** Kahan-Babuška compensated summation (reference: src/util.py:60-75
    * `float_sum`; used by stats.arithmetic_mean for ensemble averaging). */
  def kahanSum(xs: Iterable[Double]): Double = {
    var total = 0.0
    var comp = 0.0
    xs.foreach { x =>
      val t = total + x
      comp += (if (math.abs(total) >= math.abs(x)) (total - t) + x else (x - t) + total)
      total = t
    }
    total + comp
  }

  /** Compensated arithmetic mean (reference: src/stats.py:25-27). */
  def arithmeticMean(xs: Iterable[Double]): Double =
    if (xs.isEmpty) Double.NaN else kahanSum(xs) / xs.size

  def logSumExp(xs: Array[Double]): Double = {
    if (xs.isEmpty) Double.NegativeInfinity
    else {
      val m = xs.max
      if (m.isPosInfinity && !xs.exists(_.isNaN) && xs.min != Double.NegativeInfinity) m
      else if (m.isNegInfinity) m
      else {
        var s = 0.0
        var i = 0
        while (i < xs.length) { s += math.exp(xs(i) - m); i += 1 }
        m + math.log(s)
      }
    }
  }

  /** log mean(exp(a_i)): -inf entries contribute 0 to the sum but 1 to the
    * count (matches reference logmeanexp). */
  def logMeanExp(xs: Array[Double]): Double =
    if (xs.isEmpty) Double.NegativeInfinity
    else logSumExp(xs.filterNot(_ == Double.NegativeInfinity)) - math.log(xs.length)

  /** log (Σ W_i A_i / Σ W_i) given logs of W and A — likelihood-weighted
    * model averaging (reference: src/math_util.py:99-114). */
  def logAvgExpWeighted(logW: Array[Double], logA: Array[Double]): Double = {
    require(logW.length == logA.length, "logAvgExpWeighted: length mismatch")
    val joint = new Array[Double](logW.length)
    var i = 0
    while (i < joint.length) { joint(i) = logW(i) + logA(i); i += 1 }
    logSumExp(joint) - logSumExp(logW)
  }
}
