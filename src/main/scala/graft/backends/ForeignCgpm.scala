package graft.backends

/** Foreign generative predictors for `OVERRIDE GENERATIVE MODEL`
  * composition (reference: cgpm_backend.py:1082-1118 initializes
  * registry-resolved CGPMs over (outputs, inputs); the schema surface is
  * cgpm_schema/grammar.y clause(foreign)).
  *
  * A predictor models a set of output variables conditionally on a set
  * of input variables. Latent outputs (LATENT / AND EXPOSE) have no
  * observed data and exist only inside the predictor's generative model.
  * All values are Doubles (categorical columns enter as category codes,
  * like the rest of the backend layer).
  */
object ForeignCgpm {

  /** Resolved schema clause: outputs/inputs are population colnos;
    * `latentOutputs` ⊆ outputs have no observed column. */
  final case class ForeignSpec(
      predictor: String,
      outputs: Seq[Int],
      inputs: Seq[Int],
      latentOutputs: Set[Int],
      params: Map[String, String]) extends Serializable

  /** A fitted foreign predictor (immutable; refit returns a new one). */
  trait ForeignPredictor extends Serializable {
    def spec: ForeignSpec
    /** Log density of output assignments given full input assignment
      * (and optionally some of its own outputs as conditions). */
    def logpdf(targets: Seq[(Int, Double)], givens: Seq[(Int, Double)]): Double
    /** Draw the listed outputs given the full input assignment (and
      * optionally conditioned on some of its own outputs). */
    def simulate(targets: Seq[Int], givens: Seq[(Int, Double)], rng: DetRng): Seq[Double]
  }

  /** Fit a predictor by registry name over column-major data (NaN =
    * missing; latent outputs have no entry). `inputDims`: per input
    * colno, the one-hot width (1 = numeric, k = categorical with k
    * levels). `rng` drives posterior draws so ensemble members differ. */
  def fit(spec: ForeignSpec, data: Map[Int, Array[Double]],
      inputDims: Map[Int, Int], rng: DetRng): ForeignPredictor =
    spec.predictor match {
      case "linreg" => LinReg.fit(spec, data, inputDims, rng)
      case "factor_analysis" => FactorAnalysis.fit(spec, data, rng)
      case other => throw new IllegalArgumentException(
        s"Unknown foreign predictor: $other (registry: linreg, factor_analysis)")
    }

  def validate(spec: ForeignSpec, isNominal: Int => Boolean): Unit =
    spec.predictor match {
      case "linreg" =>
        require(spec.outputs.length == 1,
          "linreg models exactly one output variable")
        require(!isNominal(spec.outputs.head), "linreg output must be numerical")
      case "factor_analysis" =>
        spec.outputs.foreach(c => require(!isNominal(c),
          "factor_analysis outputs must be numerical (reference: " +
            "FactorAnalysis raises on nominal outputs)"))
        require(spec.inputs.isEmpty,
          "factor_analysis takes no GIVEN inputs")
      case other => throw new IllegalArgumentException(
        s"Unknown foreign predictor: $other (registry: linreg, factor_analysis)")
    }

  // ----------------------------------------------------- small matrices
  // The design dimensions here are schema-sized (inputs + 1, or
  // outputs + L): tiny dense ops on the driver, no library needed.

  private[graft] object Lin {
    /** Solve A x = b via Gauss-Jordan with partial pivoting (A is n×n,
      * destroyed). */
    def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      val n = b.length
      val x = b.clone()
      for (col <- 0 until n) {
        var piv = col
        for (r <- col + 1 until n) if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
        val tmp = a(col); a(col) = a(piv); a(piv) = tmp
        val tb = x(col); x(col) = x(piv); x(piv) = tb
        val d = a(col)(col)
        require(math.abs(d) > 1e-300, "singular system in foreign predictor fit")
        for (c <- col until n) a(col)(c) /= d
        x(col) /= d
        for (r <- 0 until n if r != col) {
          val f = a(r)(col)
          if (f != 0.0) {
            for (c <- col until n) a(r)(c) -= f * a(col)(c)
            x(r) -= f * x(col)
          }
        }
      }
      x
    }

    /** Inverse + log-determinant via Cholesky (A symmetric positive
      * definite, n×n). Returns (inverse, logdet). */
    def invLogDet(a: Array[Array[Double]]): (Array[Array[Double]], Double) = {
      val n = a.length
      val l = Array.ofDim[Double](n, n)
      var logdet = 0.0
      for (i <- 0 until n; j <- 0 to i) {
        var s = a(i)(j)
        for (k <- 0 until j) s -= l(i)(k) * l(j)(k)
        if (i == j) {
          require(s > 1e-300, "non-PD covariance in foreign predictor")
          l(i)(i) = math.sqrt(s)
          logdet += 2.0 * math.log(l(i)(i))
        } else l(i)(j) = s / l(j)(j)
      }
      // invert L, then A⁻¹ = L⁻ᵀ L⁻¹
      val li = Array.ofDim[Double](n, n)
      for (i <- 0 until n) {
        li(i)(i) = 1.0 / l(i)(i)
        for (j <- 0 until i) {
          var s = 0.0
          for (k <- j until i) s += l(i)(k) * li(k)(j)
          li(i)(j) = -s / l(i)(i)
        }
      }
      val inv = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- 0 to i) {
        var s = 0.0
        for (k <- math.max(i, j) until n) s += li(k)(i) * li(k)(j)
        inv(i)(j) = s; inv(j)(i) = s
      }
      (inv, logdet)
    }

    /** Cholesky factor L with A = L Lᵀ. */
    def chol(a: Array[Array[Double]]): Array[Array[Double]] = {
      val n = a.length
      val l = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- 0 to i) {
        var s = a(i)(j)
        for (k <- 0 until j) s -= l(i)(k) * l(j)(k)
        if (i == j) l(i)(i) = math.sqrt(math.max(s, 1e-12))
        else l(i)(j) = s / l(j)(j)
      }
      l
    }
  }

  // -------------------------------------------------------------- linreg

  /** Bayesian linear regression with a conjugate normal-inverse-gamma
    * prior (the reference's `linreg` registry entry; written from the
    * standard conjugate update, not ported): y = xᵀβ + ε.
    * Categorical inputs are one-hot coded. Each fit draws (β, σ²) from
    * the posterior with the caller's rng so ensemble members differ;
    * `logpdf` uses the analytic Student-t predictive. */
  final case class LinReg(
      spec: ForeignSpec,
      inputOrder: Seq[Int],            // colno per input slot
      oneHot: Map[Int, Int],           // colno → one-hot width (1 = numeric)
      betaMean: Array[Double],         // posterior mean coefficients
      vN: Array[Array[Double]],        // posterior coefficient covariance scale
      aN: Double, bN: Double,          // inverse-gamma posterior
      betaDraw: Array[Double],         // this ensemble member's draw
      sigma2Draw: Double) extends ForeignPredictor {

    private def design(givens: Seq[(Int, Double)]): Array[Double] = {
      val m = givens.toMap
      val xs = Array.newBuilder[Double]
      xs += 1.0
      inputOrder.foreach { c =>
        val v = m.getOrElse(c, throw new IllegalArgumentException(
          s"linreg input colno $c missing from givens"))
        val k = oneHot(c)
        if (k <= 1) xs += v
        else for (lvl <- 0 until k) xs += (if (v.toInt == lvl) 1.0 else 0.0)
      }
      xs.result()
    }

    override def logpdf(targets: Seq[(Int, Double)], givens: Seq[(Int, Double)]): Double = {
      require(targets.length == 1 && targets.head._1 == spec.outputs.head,
        "linreg models one output")
      val x = design(givens)
      val mu = dot(x, betaMean)
      // predictive: t_{2aN}(mu, (bN/aN)(1 + xᵀ V x))
      val xvx = quad(x)
      val scale2 = (bN / aN) * (1.0 + xvx)
      val df = 2.0 * aN
      val t = (targets.head._2 - mu) / math.sqrt(scale2)
      graft.functions.SpecialMath.lgamma((df + 1) / 2) -
        graft.functions.SpecialMath.lgamma(df / 2) -
        0.5 * math.log(df * math.Pi * scale2) -
        ((df + 1) / 2) * math.log1p(t * t / df)
    }

    override def simulate(targets: Seq[Int], givens: Seq[(Int, Double)],
        rng: DetRng): Seq[Double] = {
      require(targets == Seq(spec.outputs.head), "linreg models one output")
      val x = design(givens)
      Seq(dot(x, betaDraw) + math.sqrt(sigma2Draw) * rng.nextGaussian())
    }

    private def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    private def quad(x: Array[Double]): Double = {
      var s = 0.0
      for (i <- x.indices; j <- x.indices) s += x(i) * vN(i)(j) * x(j)
      s
    }
  }

  object LinReg {
    def fit(spec: ForeignSpec, data: Map[Int, Array[Double]],
        inputDims: Map[Int, Int], rng: DetRng): LinReg = {
      val out = spec.outputs.head
      val inputOrder = spec.inputs
      val oneHot = inputOrder.map(c => c -> inputDims.getOrElse(c, 1)).toMap
      val p = 1 + inputOrder.map(c => math.max(oneHot(c), 1)).sum
      // complete-case rows (reference skips rows with missing values,
      // cgpm_backend.py:1098-1117)
      val yCol = data.getOrElse(out, Array.empty[Double])
      val n0 = yCol.length
      val rows = (0 until n0).filter { i =>
        !yCol(i).isNaN && inputOrder.forall(c =>
          data.get(c).exists(col => !col(i).isNaN))
      }
      val lambda = 1.0  // ridge prior precision
      val a0 = 1.0; val b0 = 1.0
      // XᵀX + λI and Xᵀy accumulated row by row
      val xtx = Array.tabulate(p, p)((i, j) => if (i == j) lambda else 0.0)
      val xty = new Array[Double](p)
      var yty = 0.0
      rows.foreach { i =>
        val x = new Array[Double](p)
        x(0) = 1.0
        var pos = 1
        inputOrder.foreach { c =>
          val v = data(c)(i)
          val k = oneHot(c)
          if (k <= 1) { x(pos) = v; pos += 1 }
          else { x(pos + v.toInt) = 1.0; pos += k }
        }
        val y = yCol(i)
        yty += y * y
        for (r <- 0 until p) {
          xty(r) += x(r) * y
          for (cI <- 0 until p) xtx(r)(cI) += x(r) * x(cI)
        }
      }
      val (vn, _) = Lin.invLogDet(xtx)
      val betaMean = new Array[Double](p)
      for (r <- 0 until p; c <- 0 until p) betaMean(r) += vn(r)(c) * xty(c)
      val fitQ = {
        var s = 0.0
        for (r <- 0 until p) s += betaMean(r) * xty(r)
        s
      }
      val aN = a0 + rows.length / 2.0
      val bN = math.max(b0 + 0.5 * (yty - fitQ), 1e-9)
      // posterior draw for this ensemble member: σ² ~ IG(aN, bN),
      // β ~ N(betaMean, σ² V)
      val sigma2 = bN / math.max(rng.nextGamma(aN, 1.0), 1e-9)
      val lchol = Lin.chol(vn)
      val z = Array.fill(p)(rng.nextGaussian())
      val betaDraw = new Array[Double](p)
      for (r <- 0 until p) {
        betaDraw(r) = betaMean(r)
        for (c <- 0 to r) betaDraw(r) += math.sqrt(sigma2) * lchol(r)(c) * z(c)
      }
      LinReg(spec, inputOrder, oneHot, betaMean, vn, aN, bN, betaDraw, sigma2)
    }
  }

  // ----------------------------------------------------- factor analysis

  /** Linear-Gaussian factor analysis (the reference's FactorAnalysis
    * test CGPM: observables x = μ + W z + ε with z ~ N(0, I_L),
    * ε ~ N(0, diag Ψ); exposed latents are the factor scores — the final
    * L outputs, reference tests/test_cgpm.py:602-649). Fitted by EM on
    * complete-case rows; all query ops are conditionals of the joint
    * Gaussian over (x, z). */
  final case class FactorAnalysis(
      spec: ForeignSpec,
      manifest: Seq[Int],             // observable output colnos, in order
      latent: Seq[Int],               // declared latent output colnos
      nFactors: Int,                  // L (≥ latent.length)
      mu: Array[Double],              // D means
      w: Array[Array[Double]],        // D×L loadings
      psi: Array[Double]) extends ForeignPredictor {

    private val dD = manifest.length
    private val dL = math.max(latent.length, nFactors)
    /** colno → index in the joint (x, z) vector; declared latents take
      * the first factor slots, extra anonymous factors are unnamed. */
    private val idx: Map[Int, Int] =
      manifest.zipWithIndex.toMap ++
        latent.zipWithIndex.map { case (c, l) => c -> (manifest.length + l) }

    /** Joint covariance over (x₁..x_D, z₁..z_L). */
    @transient private lazy val cov: Array[Array[Double]] = {
      val n = dD + dL
      val c = Array.ofDim[Double](n, n)
      for (i <- 0 until dD; j <- 0 until dD) {
        var s = if (i == j) psi(i) else 0.0
        for (l <- 0 until dL) s += w(i)(l) * w(j)(l)
        c(i)(j) = s
      }
      for (i <- 0 until dD; l <- 0 until dL) {
        c(i)(dD + l) = w(i)(l); c(dD + l)(i) = w(i)(l)
      }
      for (l <- 0 until dL) c(dD + l)(dD + l) = 1.0
      c
    }
    @transient private lazy val mean: Array[Double] =
      mu ++ Array.fill(dL)(0.0)

    /** Conditional N(μ*, Σ*) of `ts` given `gs` (indices into the joint). */
    private def conditional(ts: Seq[Int], gs: Seq[(Int, Double)])
        : (Array[Double], Array[Array[Double]]) = {
      if (gs.isEmpty) {
        (ts.map(mean).toArray,
          ts.map(i => ts.map(j => cov(i)(j)).toArray).toArray)
      } else {
        val gi = gs.map(_._1)
        val sGG = gi.map(i => gi.map(j => cov(i)(j)).toArray).toArray
        val (sGGinv, _) = Lin.invLogDet(sGG)
        val dev = gs.map { case (i, v) => v - mean(i) }.toArray
        val muT = ts.map { i =>
          var s = mean(i)
          for (a <- gi.indices; b <- gi.indices)
            s += cov(i)(gi(a)) * sGGinv(a)(b) * dev(b)
          s
        }.toArray
        val sig = ts.map { i => ts.map { j =>
          var s = cov(i)(j)
          for (a <- gi.indices; b <- gi.indices)
            s -= cov(i)(gi(a)) * sGGinv(a)(b) * cov(gi(b))(j)
          s
        }.toArray }.toArray
        (muT, sig)
      }
    }

    override def logpdf(targets: Seq[(Int, Double)], givens: Seq[(Int, Double)]): Double = {
      val ts = targets.map { case (c, _) => idx(c) }
      val gs = givens.collect { case (c, v) if idx.contains(c) => (idx(c), v) }
      val (muT, sig) = conditional(ts, gs)
      val n = ts.length
      // guard numerical jitter on the diagonal
      for (i <- 0 until n) sig(i)(i) = math.max(sig(i)(i), 1e-12)
      val (inv, logdet) = Lin.invLogDet(sig)
      val dev = targets.map(_._2).toArray.zip(muT).map { case (v, m) => v - m }
      var q = 0.0
      for (i <- 0 until n; j <- 0 until n) q += dev(i) * inv(i)(j) * dev(j)
      -0.5 * (n * math.log(2 * math.Pi) + logdet + q)
    }

    override def simulate(targets: Seq[Int], givens: Seq[(Int, Double)],
        rng: DetRng): Seq[Double] = {
      val ts = targets.map(idx)
      val gs = givens.collect { case (c, v) if idx.contains(c) => (idx(c), v) }
      val (muT, sig) = conditional(ts, gs)
      for (i <- ts.indices) sig(i)(i) = math.max(sig(i)(i), 1e-12)
      val l = Lin.chol(sig)
      val z = Array.fill(ts.length)(rng.nextGaussian())
      muT.indices.map { i =>
        var s = muT(i)
        for (j <- 0 to i) s += l(i)(j) * z(j)
        s
      }
    }
  }

  object FactorAnalysis {
    def fit(spec: ForeignSpec, data: Map[Int, Array[Double]], rng: DetRng): FactorAnalysis = {
      val manifest = spec.outputs.filterNot(spec.latentOutputs)
      val latent = spec.outputs.filter(spec.latentOutputs)
      val dL = math.max(
        spec.params.get("l").map(_.toDouble.toInt).getOrElse(latent.length max 1), 1)
      require(latent.isEmpty || latent.length == dL,
        s"factor_analysis(L=$dL) exposes $dL latents, got ${latent.length}")
      val dD = manifest.length
      require(dD >= 1, "factor_analysis needs at least one observable output")
      val cols = manifest.map(c => data.getOrElse(c, Array.empty[Double]))
      val n0 = cols.headOption.map(_.length).getOrElse(0)
      val rows = (0 until n0).filter(i => cols.forall(col => !col(i).isNaN))
      if (rows.length < 2) {
        // no data: prior model (unit loadings, unit noise)
        return FactorAnalysis(spec, manifest, latent, dL,
          Array.fill(dD)(0.0),
          Array.tabulate(dD, dL)((i, l) => if (i % dL == l) 1.0 else 0.5),
          Array.fill(dD)(1.0))
      }
      val n = rows.length
      val mu = Array.tabulate(dD)(j => rows.map(cols(j)).sum / n)
      val x = rows.map(i => Array.tabulate(dD)(j => cols(j)(i) - mu(j))).toArray
      val s = Array.ofDim[Double](dD, dD)  // sample covariance
      for (r <- x; i <- 0 until dD; j <- 0 until dD) s(i)(j) += r(i) * r(j) / n
      // EM, deterministic init from covariance columns
      var w = Array.tabulate(dD, dL)((i, l) =>
        math.sqrt(math.max(s(i)(i), 1e-6)) * (if ((i + l) % 2 == 0) 0.7 else 0.4))
      var psi = Array.tabulate(dD)(i => math.max(s(i)(i) * 0.5, 1e-6))
      for (_ <- 0 until 60) {
        // E: posterior of z given x — G = (I + Wᵀ Ψ⁻¹ W)⁻¹
        val wPsi = Array.tabulate(dL, dD)((l, i) => w(i)(l) / psi(i))
        val g0 = Array.tabulate(dL, dL) { (a, b) =>
          var v = if (a == b) 1.0 else 0.0
          for (i <- 0 until dD) v += wPsi(a)(i) * w(i)(b)
          v
        }
        val (g, _) = Lin.invLogDet(g0)
        // Ez = G Wᵀ Ψ⁻¹ x ; Ezz = G + Ez Ezᵀ (accumulated over rows)
        val sumXz = Array.ofDim[Double](dD, dL)
        val sumZz = Array.ofDim[Double](dL, dL)
        x.foreach { r =>
          val ez = Array.tabulate(dL) { l =>
            var v = 0.0
            for (a <- 0 until dL; i <- 0 until dD) v += g(l)(a) * wPsi(a)(i) * r(i)
            v
          }
          for (i <- 0 until dD; l <- 0 until dL) sumXz(i)(l) += r(i) * ez(l)
          for (a <- 0 until dL; b <- 0 until dL)
            sumZz(a)(b) += g(a)(b) + ez(a) * ez(b)
        }
        // M: W = (Σ x zᵀ)(Σ zzᵀ)⁻¹ ; Ψ = diag(S − W (Σ z xᵀ)/n)
        val (zzInv, _) = Lin.invLogDet(sumZz)
        val wNew = Array.tabulate(dD, dL) { (i, l) =>
          var v = 0.0
          for (a <- 0 until dL) v += sumXz(i)(a) * zzInv(a)(l)
          v
        }
        val psiNew = Array.tabulate(dD) { i =>
          var v = s(i)(i)
          for (l <- 0 until dL) v -= wNew(i)(l) * sumXz(i)(l) / n
          math.max(v, 1e-6)
        }
        w = wNew; psi = psiNew
      }
      FactorAnalysis(spec, manifest, latent, dL, mu, w, psi)
    }
  }
}
