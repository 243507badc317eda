package graft.backends

/** Deterministic, splittable random stream.
  *
  * The reference threads one process-wide PRNG through every sampling
  * call (reference: src/bayesdb.py:90-96), which cannot be replicated on
  * a distributed engine: Spark may re-execute a task after failure, and
  * executor-side draws must be a pure function of identity, not of call
  * order. DetRng is counter-based: the stream is fully determined by
  * (seed, key...), so a sampling UDF seeds one as
  * `DetRng(sessionSeed, rowid, modelno, callsite)` and retries reproduce
  * the identical draw. Generator: SplitMix64 (public domain algorithm,
  * Steele et al., "Fast Splittable Pseudorandom Number Generators").
  */
final class DetRng(seed: Long, keys: Long*) {

  private var state: Long = {
    var h = seed
    for (k <- keys) {
      // mix each key in with the 64-bit finalizer
      h = DetRng.mix64(h ^ DetRng.mix64(k + 0x9e3779b97f4a7c15L))
    }
    h
  }

  private var cachedGauss: Double = Double.NaN

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    DetRng.mix64(state)
  }

  /** Uniform in [0, 1). */
  def nextDouble(): Double =
    (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform in (0, 1) — never 0, safe for log(). */
  def nextDoubleNonZero(): Double = {
    var u = nextDouble()
    while (u == 0.0) u = nextDouble()
    u
  }

  /** Standard normal via Marsaglia polar method (deterministic given the
    * stream; caches the second variate). */
  def nextGaussian(): Double = {
    if (!cachedGauss.isNaN) { val g = cachedGauss; cachedGauss = Double.NaN; return g }
    var x, y, s = 0.0
    do {
      x = 2.0 * nextDouble() - 1.0
      y = 2.0 * nextDouble() - 1.0
      s = x * x + y * y
    } while (s >= 1.0 || s == 0.0)
    val f = math.sqrt(-2.0 * math.log(s) / s)
    cachedGauss = y * f
    x * f
  }

  def gauss(mu: Double, sigma: Double): Double = mu + sigma * nextGaussian()

  /** Gamma(shape, scale=1) via Marsaglia–Tsang squeeze; shape < 1 via the
    * boost trick gamma(a) = gamma(a+1) * U^(1/a). */
  def nextGamma(shape: Double): Double = {
    require(shape > 0.0, s"gamma shape must be positive: $shape")
    if (shape < 1.0) {
      val g = nextGamma(shape + 1.0)
      g * math.pow(nextDoubleNonZero(), 1.0 / shape)
    } else {
      val d = shape - 1.0 / 3.0
      val c = 1.0 / math.sqrt(9.0 * d)
      while (true) {
        var x = 0.0
        var v = 0.0
        do {
          x = nextGaussian()
          v = 1.0 + c * x
        } while (v <= 0.0)
        v = v * v * v
        val u = nextDoubleNonZero()
        if (u < 1.0 - 0.0331 * x * x * x * x) return d * v
        if (math.log(u) < 0.5 * x * x + d * (1.0 - v + math.log(v))) return d * v
      }
      Double.NaN // unreachable
    }
  }

  def nextGamma(shape: Double, scale: Double): Double = nextGamma(shape) * scale

  /** Inverse-gamma draw (reference: nig_normal.py _inv_gamma). */
  def nextInvGamma(shape: Double, scale: Double): Double =
    scale / nextGamma(shape)

  /** Uniform choice from a non-empty sequence. */
  def choice[A](xs: Seq[A]): A = {
    require(xs.nonEmpty, "choice from empty sequence")
    xs(nextInt(xs.length))
  }

  /** Uniform int in [0, n). */
  def nextInt(n: Int): Int = {
    require(n > 0)
    // rejection sampling to avoid modulo bias
    val mask = -1L >>> java.lang.Long.numberOfLeadingZeros(n - 1L max 1L)
    var r = nextLong() & mask
    while (r >= n) r = nextLong() & mask
    r.toInt
  }

  /** Index draw from unnormalized log weights (multinomial in log space;
    * reference: src/bqlfn.py:555-572 generator selection). */
  def logCategorical(logWeights: IndexedSeq[Double]): Int = {
    val m = logWeights.max
    val ws = logWeights.map(w => math.exp(w - m))
    val total = ws.sum
    var u = nextDouble() * total
    var i = 0
    while (i < ws.length - 1) {
      u -= ws(i)
      if (u <= 0) return i
      i += 1
    }
    ws.length - 1
  }
}

object DetRng {
  def apply(seed: Long, keys: Long*): DetRng = new DetRng(seed, keys: _*)

  /** SplitMix64 finalizer. */
  private[backends] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
