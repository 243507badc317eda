package graft

import graft.backends.{Backends, CrossCatBackend, DetRng}
import graft.backends.CrossCat.CrossCatState
import org.scalatest.funsuite.AnyFunSuite

/** CrossCat backend statistical-correctness tests (reference analogues:
  * tests/test_cgpm.py dependence/similarity behaviors, tests/test_kl.py
  * style moment checks). Synthetic table: x ~ N(0,1), y = x + ε (strongly
  * dependent), z ~ N(5, 4) independent of both. A correct column-CRP
  * sampler must put x,y in one view and (usually) z elsewhere. */
class CrossCatSpec extends AnyFunSuite {
  import TestSpark._

  private val ColX = 0
  private val ColY = 1
  private val ColZ = 2

  private lazy val fitted: CrossCatState = {
    import spark.implicits._
    val rng = DetRng(1234L)
    val rows = (1 to 250).map { i =>
      val x = rng.nextGaussian()
      val y = x + 0.1 * rng.nextGaussian()
      val z = 5.0 + 2.0 * rng.nextGaussian()
      (i.toLong, x, y, z)
    }
    val df = rows.toDF("rowid", "x", "y", "z")
    val backend = new CrossCatBackend()
    val st0 = backend.createGenerator(df, Map(ColX -> "x", ColY -> "y", ColZ -> "z"))
    val st1 = backend.initializeModels(st0, 0 until 8, DetRng(99L))
    backend.analyzeModels(st1, None, 15, DetRng(7L)).asInstanceOf[CrossCatState]
  }

  private lazy val backend = new CrossCatBackend()

  test("registry resolves cgpm/crosscat") {
    assert(Backends.byName("cgpm").name == "cgpm")
    assert(Backends.byName("crosscat").name == "cgpm")
  }

  test("dependence probability separates dependent from independent pairs") {
    val dxy = backend.columnDependenceProbability(fitted, None, ColX, ColY)
    val dxz = backend.columnDependenceProbability(fitted, None, ColX, ColZ)
    val pxy = dxy.sum / dxy.length
    val pxz = dxz.sum / dxz.length
    assert(pxy >= 0.7, s"dependent pair got dependence $pxy")
    assert(pxz <= pxy, s"independent pair $pxz should not exceed dependent pair $pxy")
    // self-dependence shortcut
    assert(backend.columnDependenceProbability(fitted, None, ColX, ColX) == Seq(1.0))
  }

  test("mutual information is positive for dependent, ~0 for independent pairs") {
    val rng = DetRng(55L)
    val mixy = backend.columnMutualInformation(fitted, None, Seq(ColX), Seq(ColY), Nil, 200, rng)
    val mixz = backend.columnMutualInformation(fitted, None, Seq(ColX), Seq(ColZ), Nil, 200, rng)
    val mXY = mixy.sum / mixy.length
    val mXZ = mixz.sum / mixz.length
    assert(mXY > 0.3, s"MI(x,y) should be clearly positive, got $mXY")
    assert(mXZ < mXY / 2, s"MI(x,z)=$mXZ should be well below MI(x,y)=$mXY")
  }

  test("logpdf is higher near the data than far away") {
    val near = backend.logpdfJoint(fitted, None, Seq(ColX -> 0.0), Nil)
    val far = backend.logpdfJoint(fitted, None, Seq(ColX -> 50.0), Nil)
    assert(near > far + 10)
    // conditioning on the dependent column shifts the density
    val cond = backend.logpdfJoint(fitted, None, Seq(ColY -> 2.0), Seq(ColX -> 2.0))
    val marg = backend.logpdfJoint(fitted, None, Seq(ColY -> 2.0), Nil)
    assert(cond > marg, "p(y=2 | x=2) should exceed p(y=2) for y ≈ x data")
  }

  test("simulate reproduces the marginal moments") {
    val samples = backend.simulateJoint(fitted, None, Seq(ColZ), Nil, 400, DetRng(31L))
      .map(_.head)
    val mean = samples.sum / samples.length
    val sd = math.sqrt(samples.map(v => (v - mean) * (v - mean)).sum / samples.length)
    assert(math.abs(mean - 5.0) < 0.8, s"z mean $mean should be near 5")
    assert(sd > 1.0 && sd < 4.0, s"z sd $sd should be near 2")
  }

  test("conditional simulation tracks the regression line") {
    val at2 = backend.simulateJoint(fitted, None, Seq(ColY), Seq(ColX -> 2.0), 200, DetRng(41L))
      .map(_.head)
    val atm2 = backend.simulateJoint(fitted, None, Seq(ColY), Seq(ColX -> -2.0), 200, DetRng(42L))
      .map(_.head)
    val m2 = at2.sum / at2.length
    val mm2 = atm2.sum / atm2.length
    assert(m2 > mm2 + 1.0, s"E[y|x=2]=$m2 should clearly exceed E[y|x=-2]=$mm2")
  }

  test("row similarity reflects cluster co-membership in the context view") {
    // rows 1 and 2 were both drawn near their x's; find two rows with very
    // close (x,y) and two far apart
    val st = fitted
    val xs = st.data(st.colIdx(ColX))
    val near = (0 until xs.length).sortBy(xs).toSeq
    val (iLo, iLo2) = (near.head, near(1))
    val iHi = near.last
    val simClose = backend.rowSimilarity(st, None,
      st.rowids(iLo), st.rowids(iLo2), Seq(ColX))
    val simFar = backend.rowSimilarity(st, None,
      st.rowids(iLo), st.rowids(iHi), Seq(ColX))
    assert(simClose.sum / simClose.length >= simFar.sum / simFar.length)
    // unincorporated rowid → NaN (reference returns nan)
    assert(backend.rowSimilarity(st, None, 999999L, st.rowids(0), Seq(ColX)).head.isNaN)
  }

  test("predictive relevance is non-degenerate and in [0,1]") {
    val st = fitted
    val vals = backend.predictiveRelevance(st, None, st.rowids(0),
      Seq(st.rowids(1), st.rowids(2)), Seq(Seq(ColX -> 0.0)), ColX)
    assert(vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("categorical components: dependence, predict mode+confidence, simulate") {
    import spark.implicits._
    val rng = DetRng(4321L)
    // bimodal numeric with an aligned label; w independent noise
    val rows = (1 to 240).map { i =>
      val cluster = i % 2
      val x = (if (cluster == 0) -5.0 else 5.0) + rng.nextGaussian()
      val label = if (cluster == 0) "neg" else "pos"
      val w = rng.nextGaussian()
      (i.toLong, x, label, w)
    }
    val df = rows.toDF("rowid", "x", "label", "w")
    val b = new CrossCatBackend()
    val st0 = b.createGenerator(df, Map(0 -> "x", 1 -> "label", 2 -> "w"), nominalCols = Set(1))
    val st1 = b.initializeModels(st0, 0 until 6, DetRng(3L))
    val st = b.analyzeModels(st1, None, 15, DetRng(4L)).asInstanceOf[CrossCatState]

    // codes exposed for the nominal column
    assert(st.categoryCodes(1).toSet == Set("neg", "pos"))

    val dXL = b.columnDependenceProbability(st, None, 0, 1)
    assert(dXL.sum / dXL.length >= 0.7,
      s"label tracks x's clusters; got dependence ${dXL.sum / dXL.length}")

    // conditional simulate: x = +5 ⇒ label overwhelmingly "pos" (code)
    val posCode = st.categoryCodes(1).indexOf("pos").toDouble
    val sims = b.simulateJoint(st, None, Seq(1), Seq(0 -> 5.0), 100, DetRng(8L)).map(_.head)
    val share = sims.count(_ == posCode).toDouble / sims.length
    assert(share >= 0.8, s"P(label=pos | x=5) ≈ $share should be high")

    // predict: mode + mode-share confidence (reference nominal imputation)
    val (value, conf) = b.predictConfidence(st, None, 1, 20, DetRng(9L))
    assert(value == 0.0 || value == 1.0)
    assert(conf > 0.0 && conf <= 1.0)

    // categorical logpdf: a seen label has much higher density than the
    // conditional-mismatched one
    val pPos = b.logpdfJoint(st, None, Seq(1 -> posCode), Seq(0 -> 5.0))
    val pNeg = b.logpdfJoint(st, None, Seq(1 -> (1.0 - posCode)), Seq(0 -> 5.0))
    assert(pPos > pNeg + 1.0)
  }

  test("KL check: CrossCat posterior predictive tracks the conjugate NIG analytic") {
    // reference: tests/test_kl.py / test_nig_normal.py — on unimodal
    // Gaussian data the DP-mixture posterior predictive must be close to
    // the plain conjugate NIG posterior predictive
    import spark.implicits._
    val rng = DetRng(2718L)
    val rows = (1 to 300).map(i => (i.toLong, 10.0 + 2.0 * rng.nextGaussian()))
    val df = rows.toDF("rowid", "x")
    val cc = new CrossCatBackend()
    val ccSt = cc.analyzeModels(
      cc.initializeModels(cc.createGenerator(df, Map(0 -> "x")), 0 until 4, DetRng(1L)),
      None, 10, DetRng(2L))
    val nig = new graft.backends.NigNormalBackend()
    val nigSt = nig.analyzeModels(
      nig.initializeModels(nig.createGenerator(df, Map(0 -> "x")), 0 until 8, DetRng(3L)),
      None, 1, DetRng(4L))
    // KL(cc || nig) ≈ E_cc[log p_cc(x) - log p_nig(x)] by Monte Carlo
    val samples = cc.simulateJoint(ccSt, None, Seq(0), Nil, 400, DetRng(5L)).map(_.head)
    val kl = samples.map { x =>
      cc.logpdfJoint(ccSt, None, Seq(0 -> x), Nil) -
        nig.logpdfJoint(nigSt, None, Seq(0 -> x), Nil)
    }.sum / samples.length
    assert(kl.abs < 0.15, s"KL(crosscat || nig) = $kl should be near 0 on unimodal data")
    // and both place the predictive mean near 10
    val mean = samples.sum / samples.length
    assert(math.abs(mean - 10.0) < 0.6, s"predictive mean $mean")
  }

  test("analyze is deterministic under the seed") {
    val backend2 = new CrossCatBackend()
    import spark.implicits._
    val rng = DetRng(1234L)
    val rows = (1 to 250).map { i =>
      val x = rng.nextGaussian()
      val y = x + 0.1 * rng.nextGaussian()
      val z = 5.0 + 2.0 * rng.nextGaussian()
      (i.toLong, x, y, z)
    }
    val df = rows.toDF("rowid", "x", "y", "z")
    val st0 = backend2.createGenerator(df, Map(ColX -> "x", ColY -> "y", ColZ -> "z"))
    val st1 = backend2.initializeModels(st0, 0 until 8, DetRng(99L))
    val refit = backend2.analyzeModels(st1, None, 15, DetRng(7L)).asInstanceOf[CrossCatState]
    assert(refit.models.map(_.viewOf) == fitted.models.map(_.viewOf))
    assert(refit.models.map(_.alpha) == fitted.models.map(_.alpha))
  }

  test("ANALYZE ROWS: non-targeted rows keep their co-membership structure") {
    import graft.backends.AnalyzeProgram
    val targeted = Seq(1L, 2L, 3L)  // rowids
    val after = backend.analyzeModels(fitted, None, 3, DetRng(41L),
      AnalyzeProgram(rows = Some(targeted),
        // freeze column moves so views line up before/after
        subproblems = Some(Seq("row_clustering"))))
      .asInstanceOf[CrossCatState]
    val tIdx = targeted.map(fitted.rowIdx).toSet
    val others = fitted.rowids.indices.filterNot(tIdx)
    for ((m0, m1) <- fitted.models.zip(after.models); v <- m0.rowAssign.indices) {
      // moving only the targeted rows preserves whether any two
      // untargeted rows share a cluster (labels may be remapped)
      val pairs = others.take(40).combinations(2)
      for (Seq(i, j) <- pairs) {
        val before = m0.rowAssign(v)(i) == m0.rowAssign(v)(j)
        val afterEq = m1.rowAssign(v)(i) == m1.rowAssign(v)(j)
        assert(before == afterEq, s"untargeted pair ($i,$j) changed in view $v")
      }
    }
  }

  test("ANALYZE SUBPROBLEMS: hyperparameter-only kernel moves nothing else") {
    import graft.backends.AnalyzeProgram
    val after = backend.analyzeModels(fitted, None, 2, DetRng(43L),
      AnalyzeProgram(subproblems = Some(Seq("variable_hyperparameters"))))
      .asInstanceOf[CrossCatState]
    for ((m0, m1) <- fitted.models.zip(after.models)) {
      assert(m1.viewOf == m0.viewOf, "view partition must not move")
      assert(m1.rowAssign == m0.rowAssign, "row partitions must not move")
      assert(m1.alpha == m0.alpha, "view-CRP concentration must not move")
      assert(m1.viewAlpha == m0.viewAlpha, "row-CRP concentrations must not move")
    }
    assert(after.models.exists(m1 =>
      m1.hypers != fitted.models.find(_.modelno == m1.modelno).get.hypers),
      "hyperparameters should move under the hypers kernel")
    // invalid subproblem name surfaces a named error
    val e = intercept[IllegalArgumentException] {
      backend.analyzeModels(fitted, None, 1, DetRng(44L),
        AnalyzeProgram(subproblems = Some(Seq("bogus_kernel"))))
    }
    assert(e.getMessage.contains("Invalid subproblems"))
  }

  test("MCMC subsample is uniform and invariant under input reordering") {
    // r3 verdict #1: a first-N-by-rowid prefix silently biases every
    // estimator on ingest-ordered data (reference reservoir-samples,
    // cgpm_backend.py:189-205). 1200 rows where the first 600 and last
    // 600 come from different regimes; the 500-row subsample must mix
    // them, and the fitted state must not depend on input layout.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rng = DetRng(77L)
    val rows = (1 to 1200).map { i =>
      val shift = if (i <= 600) 0.0 else 10.0
      (i.toLong, shift + rng.nextGaussian(), if (i % 2 == 0) "a" else "b")
    }
    val df = rows.toDF("rowid", "x", "g")
    val cols = Map(0 -> "x", 1 -> "g")
    val be = new CrossCatBackend()
    val a = be.createGenerator(df, cols, Set(1)).asInstanceOf[CrossCatState]
    val b = be.createGenerator(df.orderBy(col("rowid").desc).repartition(7), cols, Set(1))
      .asInstanceOf[CrossCatState]
    assert(a.rowids.toSeq == b.rowids.toSeq, "sampled rowid set must be order-invariant")
    assert(a.data.map(_.toSeq).toSeq == b.data.map(_.toSeq).toSeq,
      "fitted data matrix must be order-invariant")
    assert(a.rowids.length == 500)
    // uniform, not a prefix: both halves of the table are represented
    val headFrac = a.rowids.count(_ <= 600).toDouble / a.rowids.length
    assert(headFrac > 0.35 && headFrac < 0.65,
      s"subsample should mix the table uniformly, got head fraction $headFrac")
    // and the fit itself is reproducible end-to-end
    val fitA = be.analyzeModels(be.initializeModels(a, 0 until 2, DetRng(5L)),
      None, 3, DetRng(6L)).asInstanceOf[CrossCatState]
    val fitB = be.analyzeModels(be.initializeModels(b, 0 until 2, DetRng(5L)),
      None, 3, DetRng(6L)).asInstanceOf[CrossCatState]
    assert(fitA.models.map(_.viewOf) == fitB.models.map(_.viewOf))
    assert(fitA.models.map(_.rowAssign) == fitB.models.map(_.rowAssign))
  }

  test("category dictionaries build in one scan regardless of column count") {
    // r3 verdict #3: one groupBy job PER nominal column meant a
    // 64-column population paid ~64 full scans at CREATE GENERATOR.
    // Job count during createGenerator must not scale with columns.
    import spark.implicits._
    val sc = spark.sparkContext
    def fit(nNom: Int, group: String): CrossCatState = {
      val names = (0 until nNom).map(i => s"c$i")
      val rows = (1 to 300).map { i =>
        (i.toLong, names.map(n => s"${n}_v${i % 5}").mkString(","))
      }
      var df = rows.toDF("rowid", "packed")
      for ((n, i) <- names.zipWithIndex)
        df = df.withColumn(n, org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("packed"), ",").getItem(i))
      val cols = names.zipWithIndex.map { case (n, i) => i -> n }.toMap
      sc.setJobGroup(group, group)
      try new CrossCatBackend().createGenerator(df.select(
          (Seq(org.apache.spark.sql.functions.col("rowid")) ++ names.map(org.apache.spark.sql.functions.col)): _*),
        cols, cols.keySet).asInstanceOf[CrossCatState]
      finally sc.clearJobGroup()
    }
    val small = fit(2, "dict-small")
    val large = fit(12, "dict-large")
    assert(small.cats.size == 2 && large.cats.size == 12)
    assert(large.cats.values.forall(_.size == 5))
    // sorted by frequency then value — each value appears 60 times, so
    // the deterministic tie-break is the value itself
    assert(large.cats(3) == (0 until 5).map(v => s"c3_v$v"))
    def jobs(group: String): Int = {
      // status store updates async — poll until the count is stable
      var last = -1; var stable = 0
      val deadline = System.nanoTime() + 5000000000L
      while (System.nanoTime() < deadline && (last <= 0 || stable < 3)) {
        val n = sc.statusTracker.getJobIdsForGroup(group).length
        stable = if (n == last) stable + 1 else 0
        last = n
        Thread.sleep(100)
      }
      last
    }
    val (jSmall, jLarge) = (jobs("dict-small"), jobs("dict-large"))
    assert(jLarge <= jSmall + 1,
      s"job count must not scale with nominal column count: 2 cols -> $jSmall jobs, 12 cols -> $jLarge jobs")
  }

  test("view posterior is calibrated against exact enumeration (6-row pair)") {
    // Two perfectly-aligned 2-category nominal columns over 6 rows:
    // summing the CRP x Dirichlet-multinomial marginal over all 203 row
    // partitions gives exact P(dependent) = 0.75/0.60/0.42 at view
    // concentration 0.5/1/2; hyper-grid resampling widens the band.
    // The chain must land inside it -- the pre-round-6 column kernel
    // (fresh-prior auxiliary for singleton views, breaking detailed
    // balance) drifted to 0.1-0.3 and failed this bound low.
    val spark2 = TestSpark.spark
    import spark2.implicits._
    val b = new graft.bql.BayesDB(spark2, seed = 17L)
    val rows = Seq(("x", "a"), ("x", "a"), ("x", "a"),
      ("y", "b"), ("y", "b"), ("y", "b"))
    b.registerTable("t6", rows.toDF("foo", "bar"))
    b.execute("create population p6 for t6 (foo nominal; bar nominal)")
    b.execute("create generator p6_cc for p6 using cgpm")
    b.execute("initialize 40 models for p6_cc")
    b.execute("analyze p6_cc for 100 iterations")
    val dep = b.execute("estimate dependence probability of foo with bar by p6")
      .collect().head.getDouble(0)
    assert(dep >= 0.3 && dep <= 0.8,
      s"dep(foo,bar)=$dep outside the exact-posterior band [0.3, 0.8]")
  }
}
