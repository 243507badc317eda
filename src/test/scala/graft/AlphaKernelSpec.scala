package graft

import graft.backends.{AnalyzeProgram, CrossCatBackend, DetRng}
import graft.backends.CrossCat._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-enumeration validation of the CRP concentration (alpha) Gibbs
  * kernels — the one subproblem the Geweke harness does not cover (its
  * grid-uniform target is inconsistent with the forward sampler's
  * Gamma(1,1) draws, so the joint test cannot include them; reference
  * analogue: cgpm's crp alpha transition, cgpm_backend.py:1425-1446).
  *
  * Method, row-concentration kernel: on a 2-column/3-row problem the
  * joint posterior over (row partition z, grid alpha a) with a 2-point
  * alpha grid has 5 × 2 = 10 states and is exactly enumerable:
  *
  *   pi(z, a | x)  ∝  CRP(z | a) · U(a over grid) · prod_j marglik(x_j | z)
  *
  * If the kernels leave pi invariant, one sweep applied to an exact
  * pi-sample is still an exact pi-sample — so M replicates of
  * [draw (z,a) ~ pi by enumeration] → [row_clustering +
  * row_clustering_concentration sweep] must match pi by chi-square
  * goodness-of-fit, with NO burn-in asymptotics to absorb. The CRP term
  * is enumerated by sequential seating (an independent construction
  * from the kernel's closed-form crpLogpdf).
  *
  * The negative control replaces the learned alpha with a uniform grid
  * draw after each sweep — a partition-blind concentration kernel, the
  * natural bug class — and must fail the same test (the true alpha
  * marginal here is 0.26/0.74, far from uniform).
  *
  * The view-concentration kernel's conditional is additionally pinned
  * directly: given a FIXED column partition it is an independent draw
  * from softmax(CRP(viewSizes | a)) over the d-derived grid — empirical
  * frequencies must match the enumerated conditional and must REJECT
  * the uniform target (power check). */
class AlphaKernelSpec extends AnyFunSuite {

  private val N = 3 // rows
  private val C = 2 // columns
  private val H0 = NigHypers(m = 0.0, r = 1.0, s = 1.0, nu = 1.0)
  // gridSize = 2 → row-alpha grid {1/3, 3}, view-alpha grid {1/2, 2}
  private val backend = new CrossCatBackend(gridSize = 2)
  private val rowGrid = logGrid(1.0 / N, N.toDouble, 2)
  private val viewGrid = logGrid(1.0 / C, C.toDouble, 2)

  private lazy val skeleton = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, -2.0, 5.0), (2L, 0.1, -1.0), (3L, 2.2, 0.5)
    ).toDF("rowid", "a", "b")
    backend.createGenerator(df, Map(0 -> "a", 1 -> "b"))
      .asInstanceOf[CrossCatState]
  }

  /** The 5 set partitions of 3 rows in canonical (first-appearance)
    * labeling. */
  private val partitions: IndexedSeq[IndexedSeq[Int]] = IndexedSeq(
    IndexedSeq(0, 0, 0), IndexedSeq(0, 0, 1), IndexedSeq(0, 1, 0),
    IndexedSeq(0, 1, 1), IndexedSeq(0, 1, 2))

  /** CRP log-probability by SEQUENTIAL SEATING — independent of the
    * closed-form crpLogpdf the kernel scores with. */
  private def seqCrpLogp(z: IndexedSeq[Int], alpha: Double): Double = {
    val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var lp = 0.0
    for (i <- z.indices) {
      val k = z(i)
      lp += (if (k < counts.length) math.log(counts(k).toDouble)
             else math.log(alpha)) - math.log(i + alpha)
      if (k == counts.length) counts += 1 else counts(k) += 1
    }
    lp
  }

  /** Log marginal likelihood of the data under partition z: per column,
    * per cluster, the NIG-Normal evidence. */
  private def logLik(z: IndexedSeq[Int]): Double =
    (0 until C).map { j =>
      val xs = skeleton.data(j)
      z.distinct.map { c =>
        val idx = z.indices.filter(z(_) == c)
        val n = idx.length.toDouble
        val s = idx.map(xs(_)).sum
        val ss = idx.map(i => xs(i) * xs(i)).sum
        marginalLogp(n, s, ss, H0)
      }.sum
    }.sum

  /** Enumerated posterior over the 10 (partitionIdx, alphaIdx) states. */
  private lazy val exactPi: IndexedSeq[Double] = {
    val logw = for (z <- partitions; a <- rowGrid)
      yield seqCrpLogp(z, a) + logLik(z)
    val mx = logw.max
    val w = logw.map(lw => math.exp(lw - mx))
    val tot = w.sum
    w.map(_ / tot)
  }

  private def model(z: IndexedSeq[Int], aIdx: Int): CrossCatModel =
    CrossCatModel(0, 1.0, IndexedSeq(0, 0), IndexedSeq(rowGrid(aIdx)),
      IndexedSeq(z), IndexedSeq.fill(C)(NigH(H0)))

  private def sweep(m: CrossCatModel, rng: DetRng, kernels: Seq[String]): CrossCatModel = {
    val st = skeleton.copy(models = IndexedSeq(m))
    backend.analyzeModels(st, Some(Seq(0)), 1, rng,
      AnalyzeProgram(subproblems = Some(kernels)))
      .asInstanceOf[CrossCatState].models.head
  }

  private def canonical(assign: IndexedSeq[Int]): IndexedSeq[Int] = {
    val relabel = scala.collection.mutable.Map.empty[Int, Int]
    assign.map(k => relabel.getOrElseUpdate(k, relabel.size))
  }

  private def stateId(m: CrossCatModel): Int = {
    val z = canonical(m.rowAssign(0))
    val pIdx = partitions.indexOf(z)
    val aIdx = rowGrid.indices.minBy(i => math.abs(rowGrid(i) - m.viewAlpha(0)))
    pIdx * rowGrid.length + aIdx
  }

  /** Chi-square goodness-of-fit of observed state counts against exact
    * probabilities (df = states − 1; all 10 expected counts ≥ 30 at the
    * M used here, comfortably in the chi-square regime). */
  private def gofP(counts: Map[Int, Int], probs: IndexedSeq[Double], m: Int): Double = {
    val chi2 = probs.indices.map { s =>
      val e = m * probs(s)
      val o = counts.getOrElse(s, 0).toDouble
      (o - e) * (o - e) / e
    }.sum
    graft.functions.SpecialMath.chi2Sf(chi2, (probs.length - 1).toDouble)
  }

  /** Draw an exact pi state, run one (rows + row-concentration) sweep,
    * optionally corrupt alpha with a partition-blind uniform grid draw. */
  private def replicate(seed: Long, corruptAlpha: Boolean): Int = {
    val rng = DetRng(seed)
    val s0 = rng.logCategorical(exactPi.map(math.log))
    var m = model(partitions(s0 / rowGrid.length), s0 % rowGrid.length)
    m = sweep(m, DetRng(rng.nextLong()),
      Seq("row_clustering", "row_clustering_concentration"))
    if (corruptAlpha)
      m = m.copy(viewAlpha = IndexedSeq(rowGrid(rng.nextInt(rowGrid.length))))
    stateId(m)
  }

  private val M = 3000

  private def invarianceP(attempt: Int, corrupt: Boolean): Double = {
    val base = 0xa1fa0000L + attempt * 2L * M
    val ids = (0 until M).map(i => replicate(base + i, corrupt))
    gofP(ids.groupBy(identity).map { case (k, v) => k -> v.size }, exactPi, M)
  }

  test("row-concentration kernel leaves the enumerated posterior invariant") {
    // p ~ U(0,1) under a correct kernel; retries absorb chi-square
    // approximation slack, not real divergence
    val attempts = (1 to 3).iterator.map(a => invarianceP(a, corrupt = false))
    assert(attempts.exists(_ > 1e-4),
      "one sweep moved an exact posterior sample off the enumerated posterior")
  }

  test("negative control: a partition-blind alpha redraw fails the check") {
    val ps = (1 to 3).map(a => invarianceP(a + 10, corrupt = true))
    assert(ps.forall(_ < 1e-3),
      s"uniform-alpha corruption was not detected: p-values $ps")
  }

  test("view-concentration conditional matches the enumerated grid posterior") {
    // Given a FIXED column partition the kernel's draw is independent of
    // the current alpha: empirical frequencies over the 2-point grid
    // must match softmax(CRP(viewSizes | a)) — and must REJECT the
    // uniform target (the power check standing in for a broken kernel,
    // e.g. one scoring k·log(a) without the Gamma-ratio terms).
    val cases = Seq(
      (IndexedSeq(0, 0), IndexedSeq(IndexedSeq(0, 1, 2))),              // 1 view of 2 cols
      (IndexedSeq(0, 1), IndexedSeq(IndexedSeq(0, 1, 2), IndexedSeq(0, 1, 2)))) // 2 singleton views
    for ((viewOf, rows) <- cases) {
      val nViews = rows.length
      val m0 = CrossCatModel(0, viewGrid(0), viewOf,
        IndexedSeq.fill(nViews)(1.0), rows, IndexedSeq.fill(C)(NigH(H0)))
      val sizes = (0 until nViews).map(v => viewOf.count(_ == v))
      val logw = viewGrid.map { a =>
        // sequential-seating CRP over the column partition
        seqCrpLogp(viewOf, a)
      }
      val mx = logw.max
      val w = logw.map(lw => math.exp(lw - mx))
      val cond = w.map(_ / w.sum)
      val draws = (0 until 2000).map { i =>
        val m1 = sweep(m0, DetRng(0xa1fa1000L + i),
          Seq("variable_clustering_concentration"))
        viewGrid.indices.minBy(k => math.abs(viewGrid(k) - m1.alpha))
      }
      val counts = draws.groupBy(identity).map { case (k, v) => k -> v.size }
      val pGood = gofP(counts, cond, 2000)
      assert(pGood > 1e-4,
        s"view-alpha conditional off the enumerated posterior (sizes $sizes): p=$pGood")
      val pUniform = gofP(counts, IndexedSeq(0.5, 0.5), 2000)
      assert(pUniform < 1e-3,
        s"test lacks power: uniform target not rejected (sizes $sizes): p=$pUniform")
    }
  }
}
