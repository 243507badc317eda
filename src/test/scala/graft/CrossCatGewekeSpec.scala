package graft

import graft.backends.{AnalyzeProgram, CrossCatBackend, DetRng}
import graft.backends.CrossCat._
import org.scalatest.funsuite.AnyFunSuite

/** Geweke joint-distribution test for the CrossCat row-clustering and
  * column-view Gibbs kernels (the systematic harness the round-6
  * detailed-balance bug f6c731c motivated; method: Geweke 2004,
  * "Getting it right" — reference analogue: the chain-vs-prior
  * diagnostics the cgpm test suite runs on small grids).
  *
  * Model under test (concentrations and hypers FIXED so the two kernels
  * are exactly a Gibbs sampler for it):
  *   viewOf      ~ CRP(alpha = 1) over C columns
  *   viewAlpha_v ~ Gamma(1,1) max 1e-3          (the kernel's aux draw)
  *   rows_v      ~ CRP(viewAlpha_v) over N rows
  *   x_ij | z    ~ NIG-Normal predictive, hypers H0 (sequential draws)
  *
  * Two samplers of the SAME joint:
  *  - forward: draw (z, x) from the prior exactly as written above;
  *  - successive-conditional: start at a forward draw, then alternate
  *    [z ~ Gibbs(row_clustering + variable_clustering | x)] and
  *    [x ~ p(x | z)] for T cycles. If (and only if) the kernels leave
  *    p(z | x) invariant, the T-th iterate is still an exact joint
  *    sample, so every statistic of (z, x) must match the forward
  *    distribution — tested by two-sample chi-square over M independent
  *    replicates per side.
  *
  * The negative control re-introduces the f6c731c bug class (replace a
  * singleton view's LEARNED row partition with a fresh prior draw — the
  * exact detailed-balance violation the round-6 fix removed) and must
  * fail the same test. */
class CrossCatGewekeSpec extends AnyFunSuite {

  private val N = 7 // rows
  private val C = 3 // columns
  private val H0 = NigHypers(m = 0.0, r = 1.0, s = 1.0, nu = 1.0)
  private val M = 1500 // replicates per side
  private val T = 5   // chain cycles per replicate
  private val backend = new CrossCatBackend()

  // a state skeleton from the public path (data is replaced per draw);
  // built lazily so the Spark fixture starts once
  private lazy val skeleton = {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to N).map(i => (i.toLong, 0.0, 0.0, 0.0)).toDF("rowid", "a", "b", "c")
    backend.createGenerator(df, Map(0 -> "a", 1 -> "b", 2 -> "c"))
      .asInstanceOf[CrossCatState]
  }

  /** Sequential CRP draw (same construction the backend's init uses). */
  private def crp(n: Int, alpha: Double, rng: DetRng): IndexedSeq[Int] = {
    val out = new Array[Int](n)
    val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until n) {
      val w = counts.map(c => math.log(c.toDouble)).toIndexedSeq :+ math.log(alpha)
      val k = rng.logCategorical(w)
      if (k == counts.length) counts += 1 else counts(k) += 1
      out(i) = k
    }
    out.toIndexedSeq
  }

  private def forwardModel(rng: DetRng): CrossCatModel = {
    val viewOf = crp(C, 1.0, rng)
    val nViews = viewOf.max + 1
    val viewAlpha = IndexedSeq.fill(nViews)(rng.nextGamma(1.0, 1.0) max 1e-3)
    val rowAssign = (0 until nViews).map(v => crp(N, viewAlpha(v), rng))
    CrossCatModel(0, 1.0, viewOf, viewAlpha, rowAssign,
      IndexedSeq.fill(C)(NigH(H0)))
  }

  /** x | z, h: per column, sequential NIG predictive draws within each
    * row cluster of the column's view (an exact joint draw by
    * exchangeability), under the model's own column hypers. */
  private def drawData(m: CrossCatModel, rng: DetRng): Array[Array[Double]] =
    (0 until C).map { j =>
      val assign = m.rowAssign(m.viewOf(j))
      val k = assign.max + 1
      val suff = ColSuff.empty(NumericalCol, k)
      val xs = new Array[Double](N)
      for (i <- 0 until N) {
        val x = suff.sample(assign(i), m.hypers(j), rng)
        suff.add(assign(i), x)
        xs(i) = x
      }
      xs
    }.toArray

  /** One kernel application via the public ANALYZE surface
    * (concentration + hyper kernels disabled). */
  private def kernel(m: CrossCatModel, x: Array[Array[Double]], rng: DetRng,
      which: String): CrossCatModel = {
    val st = skeleton.copy(models = IndexedSeq(m), data = x)
    backend.analyzeModels(st, Some(Seq(0)), 1, rng,
      AnalyzeProgram(subproblems = Some(Seq(which))))
      .asInstanceOf[CrossCatState].models.head
  }

  /** The f6c731c bug class, re-introduced: any singleton view's learned
    * row partition (and alpha) is discarded for a fresh prior draw. */
  private def breakSingletons(m: CrossCatModel, rng: DetRng): CrossCatModel = {
    var out = m
    for (v <- m.rowAssign.indices) {
      val singleton = (0 until C).count(j => m.viewOf(j) == v) == 1
      if (singleton) {
        val a = rng.nextGamma(1.0, 1.0) max 1e-3
        out = out.copy(
          viewAlpha = out.viewAlpha.updated(v, a),
          rowAssign = out.rowAssign.updated(v, crp(N, a, rng)))
      }
    }
    out
  }

  /** Statistics of one joint sample. s1: number of views; s2: number of
    * row clusters in column 0's view; s3: largest cluster there;
    * s4: coarse bin of column 0's data mean (x marginal); s5: decile of
    * column 0's within-cluster/total sum of squares under its view's
    * partition — the z–x COUPLING statistic (in a correct joint sample
    * clusters fit their data; a partition decoupled from x pushes the
    * ratio toward 1). */
  private def stats(m: CrossCatModel, x: Array[Array[Double]]): Seq[Int] = {
    val a0 = m.rowAssign(m.viewOf(0))
    val sizes = a0.groupBy(identity).map(_._2.size)
    val mean0 = x(0).sum / N
    val tss = x(0).map(v => (v - mean0) * (v - mean0)).sum
    val wss = a0.indices.groupBy(a0).values.map { idx =>
      val mu = idx.map(x(0)).sum / idx.size
      idx.map(i => (x(0)(i) - mu) * (x(0)(i) - mu)).sum
    }.sum
    val ratio = if (tss <= 0) 1.0 else wss / tss
    Seq(m.rowAssign.length, sizes.size, sizes.max,
      math.max(-4, math.min(4, math.floor(mean0 * 2).toInt)),
      math.min(9, math.max(0, (ratio * 10).toInt)))
  }

  private def replicate(seed: Long, chain: Boolean, break_ : Boolean): Seq[Int] = {
    val rng = DetRng(seed)
    var m = forwardModel(rng)
    var x = drawData(m, rng)
    if (chain) {
      for (_ <- 0 until T) {
        m = kernel(m, x, DetRng(rng.nextLong()), "row_clustering")
        // the bug class corrupts BETWEEN kernels: the column kernel then
        // weighs stay/leave for singleton views against a prior-drawn
        // partition instead of the learned one — f6c731c's exact
        // mechanism — and the biased column moves compound per cycle
        if (break_) m = breakSingletons(m, rng)
        m = kernel(m, x, DetRng(rng.nextLong()), "variable_clustering")
        x = drawData(m, rng)
      }
    }
    stats(m, x)
  }

  private val NStats = 5

  /** Bonferroni-combined two-sample chi-square over the statistics for
    * one fresh (forward vs chain) comparison. */
  private def minP(attempt: Int, break_ : Boolean): Double = {
    val base = 0xbeef0000L + attempt * 2L * M
    val fwd = (0 until M).map(i => replicate(base + i, chain = false, break_ = false))
    val chn = (0 until M).map(i => replicate(base + M + i, chain = true, break_ = break_))
    val ps = (0 until NStats).map { s =>
      StatTestUtil.chiSquareTwoSample(
        fwd.groupBy(_(s)).map { case (k, v) => k -> v.size },
        chn.groupBy(_(s)).map { case (k, v) => k -> v.size })
    }
    math.min(1.0, ps.min * NStats)
  }

  test("row + column kernels pass the Geweke joint-distribution check") {
    // p ~ U(0,1) under a correct kernel; three independent attempts all
    // below 1e-4 has probability < 1e-12 — retries absorb chi-square
    // approximation slack, not real divergence
    val attempts = (1 to 3).iterator.map(a => minP(a, break_ = false))
    assert(attempts.exists(_ > 1e-4),
      "forward and Gibbs-chain joint distributions diverged (3 attempts)")
  }

  test("negative control: the pre-f6c731c singleton redraw fails the check") {
    val ps = (1 to 3).map(a => minP(a + 10, break_ = true))
    assert(ps.forall(_ < 1e-3),
      s"broken singleton-view kernel was not detected: p-values $ps")
  }

  // ---- hypers-kernel Geweke (grid-uniform hyperprior) ----
  //
  // transitionHypers is coordinate-wise grid Gibbs scored by the cluster
  // marginal likelihood — the implied prior is product-uniform over the
  // (moments-derived, data-of-record-independent) grid lattice. A second
  // skeleton with non-degenerate moments fixes the grids; the forward
  // sampler draws each hyper uniformly from the same grids, and the
  // chain runs row_clustering + variable_hyperparameters (view structure
  // untouched by either kernel, so it conditions per replicate).

  private lazy val skeletonH = {
    val spark = TestSpark.spark
    import spark.implicits._
    val vals = IndexedSeq(-3.0, -2.0, -1.0, 0.0, 1.0, 2.0, 3.0)
    val df = (0 until N).map(i => (i.toLong + 1, vals(i), vals(i), vals(i)))
      .toDF("rowid", "a", "b", "c")
    backend.createGenerator(df, Map(0 -> "a", 1 -> "b", 2 -> "c"))
      .asInstanceOf[CrossCatState]
  }

  private val GridSize = 15 // CrossCatBackend default

  private lazy val hyperGrids: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] =
    (0 until C).map { j =>
      val mom = skeletonH.moments(j)
      IndexedSeq(
        linGrid(mom.min, mom.max, GridSize),
        logGrid(1.0 / N, 10.0, GridSize),
        logGrid(mom.variance / 100.0 + 1e-9, mom.variance * 100.0 + 1e-6, GridSize),
        logGrid(0.5, N.toDouble max 2.0, GridSize))
    }

  private def forwardModelH(rng: DetRng): CrossCatModel = {
    val base = forwardModel(rng)
    val hypers = (0 until C).map { j =>
      val g = hyperGrids(j)
      def u(k: Int): Double = g(k)(rng.nextInt(g(k).length))
      NigH(NigHypers(u(0), u(1), u(2), u(3)))
    }
    base.copy(hypers = hypers)
  }

  /** Hyper-sensitive statistics: grid indices of column 0's s and nu
    * (exact lattice values), cluster count, and the s-tercile ×
    * x-variance-tercile JOINT code — a prior-redrawn hyper keeps its
    * uniform MARGINAL, so only the s↔spread coupling (bigger s ⇒ wider
    * predictive ⇒ larger |x| spread) can expose it. */
  private def statsH(m: CrossCatModel, x: Array[Array[Double]]): Seq[Int] = {
    val NigH(h) = m.hypers(0): @unchecked
    val sIdx = hyperGrids(0)(2).indexOf(h.s)
    val nuIdx = hyperGrids(0)(3).indexOf(h.nu)
    val a0 = m.rowAssign(m.viewOf(0))
    val mean0 = x(0).sum / N
    val v0 = x(0).map(v => (v - mean0) * (v - mean0)).sum / N
    val varBin = if (v0 < 1.0) 0 else if (v0 < 10.0) 1 else 2
    Seq(sIdx, nuIdx, a0.distinct.size, (sIdx / 5) * 3 + varBin)
  }

  private def replicateH(seed: Long, chain: Boolean, corrupt: Boolean): Seq[Int] = {
    val rng = DetRng(seed)
    var m = forwardModelH(rng)
    var x = drawDataH(m, rng)
    if (chain) {
      for (_ <- 0 until T) {
        m = kernelH(m, x, DetRng(rng.nextLong()), "row_clustering")
        m = kernelH(m, x, DetRng(rng.nextLong()), "variable_hyperparameters")
        x = drawDataH(m, rng)
        // corrupted kernel: column 0's s redrawn from its prior AFTER x
        // is already drawn — the s↔x mismatch survives to measurement
        // (corrupting before the x draw would "heal" into a valid prior
        // sample of the (s, x) block, exactly like the singleton case)
        if (corrupt) {
          val NigH(h) = m.hypers(0): @unchecked
          val g = hyperGrids(0)(2)
          m = m.copy(hypers = m.hypers.updated(0,
            NigH(h.copy(s = g(rng.nextInt(g.length))))))
        }
      }
    }
    statsH(m, x)
  }

  private def kernelH(m: CrossCatModel, x: Array[Array[Double]], rng: DetRng,
      which: String): CrossCatModel = {
    val st = skeletonH.copy(models = IndexedSeq(m), data = x)
    backend.analyzeModels(st, Some(Seq(0)), 1, rng,
      AnalyzeProgram(subproblems = Some(Seq(which))))
      .asInstanceOf[CrossCatState].models.head
  }

  private def drawDataH(m: CrossCatModel, rng: DetRng): Array[Array[Double]] =
    drawData(m, rng)

  private def minPH(attempt: Int, corrupt: Boolean): Double = {
    val base = 0xcafe0000L + attempt * 2L * M
    val fwd = (0 until M).map(i => replicateH(base + i, chain = false, corrupt = false))
    val chn = (0 until M).map(i => replicateH(base + M + i, chain = true, corrupt = corrupt))
    val ps = (0 until 4).map { s =>
      StatTestUtil.chiSquareTwoSample(
        fwd.groupBy(_(s)).map { case (k, v) => k -> v.size },
        chn.groupBy(_(s)).map { case (k, v) => k -> v.size })
    }
    math.min(1.0, ps.min * 4)
  }

  test("hypers kernel passes the Geweke check (with the row kernel)") {
    val attempts = (1 to 3).iterator.map(a => minPH(a, corrupt = false))
    assert(attempts.exists(_ > 1e-4),
      "forward and Gibbs-chain hyper distributions diverged (3 attempts)")
  }

  test("negative control: a prior-decoupled s hyper fails the coupling check") {
    val ps = (1 to 3).map(a => minPH(a + 10, corrupt = true))
    assert(ps.forall(_ < 1e-3),
      s"decoupled hyper kernel was not detected: p-values $ps")
  }
}
