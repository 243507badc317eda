package graft.backends

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SpecialMath.logMeanExp

/** Normal-Inverse-Gamma-Normal backend (reference:
  * src/backends/nig_normal.py): every column is independently Gaussian
  * with unknown (μ, σ²) under a conjugate NIG prior; one Gibbs step
  * reaches the posterior, so ANALYZE redraws (μ, σ) per (column, model)
  * from the posterior hypers.
  *
  * Spark shape: sufficient statistics (count, Σx, Σx²) are computed in a
  * single distributed aggregation over all modeled columns
  * (reference computes them with a driver-side Python loop,
  * nig_normal.py:432-450); the fitted state is O(cols × models) and
  * broadcast for per-row estimator evaluation.
  */
object NigNormalBackend {
  final case class ColStats(count: Long, sum: Double, sumsq: Double) extends Serializable

  final case class ColParams(mu: Double, sigma: Double) extends Serializable

  /** Posterior NIG hypers given prior (m, V, a, b) and suff stats
    * (reference: nig_normal.py posterior_hypers). */
  def posteriorHypers(hypers: (Double, Double, Double, Double),
      stats: ColStats): (Double, Double, Double, Double) = {
    val (m, v, a, b) = hypers
    val vn = 1.0 / (1.0 / v + stats.count)
    val mn = vn * ((1.0 / v) * m + stats.sum)
    val an = a + stats.count / 2.0
    val bn = b + 0.5 * (m * m / v + stats.sumsq - mn * mn / vn)
    (mn, vn, an, bn)
  }

  /** Closed-form log posterior-predictive density: under the conjugate
    * NIG prior the predictive for a fresh observation is Student-t with
    * df = 2·an, location mn, scale² = bn(1+vn)/an (the standard conjugate
    * result the reference's Gibbs draw targets, nig_normal.py:133-140).
    * This is the backend's deterministic spine — the same
    * [[posteriorHypers]] the ANALYZE redraw uses — so a SQL oracle can
    * pin the distributed suff-stats pass and the hyper algebra exactly,
    * even though the ensemble's RNG draws cannot be reproduced in SQL. */
  def posteriorPredictiveLogpdf(hypers: (Double, Double, Double, Double),
      stats: ColStats, x: Double): Double = {
    val (mn, vn, an, bn) = posteriorHypers(hypers, stats)
    val df = 2.0 * an
    val scale = math.sqrt(bn * (1.0 + vn) / an)
    val z = (x - mn) / scale
    graft.functions.SpecialMath.lgamma((df + 1.0) / 2.0) -
      graft.functions.SpecialMath.lgamma(df / 2.0) -
      0.5 * math.log(df * math.Pi) - math.log(scale) -
      ((df + 1.0) / 2.0) * math.log1p(z * z / df)
  }

  val HalfLog2Pi: Double = 0.5 * math.log(2 * math.Pi)

  def logpdfGaussian(x: Double, mu: Double, sigma: Double): Double = {
    val d = x - mu
    -math.log(sigma) - HalfLog2Pi - 0.5 * d * d / (sigma * sigma)
  }

  final case class State(
      hypers: (Double, Double, Double, Double),
      cols: Map[Int, ColStats],
      models: Map[Int, Map[Int, ColParams]],
      deviations: Map[Int, Int]) extends GeneratorState {
    def modelNumbers: Seq[Int] = models.keys.toSeq.sorted
  }
}

class NigNormalBackend(
    hypers: (Double, Double, Double, Double) = (0.0, 1.0, 1.0, 1.0))
  extends Backend {

  import NigNormalBackend._

  override def name: String = "nig_normal"

  /** One distributed pass computing (count, Σx, Σx²) for every modeled
    * column. Nulls are excluded per column (the reference would crash on
    * NULL; we take the well-defined per-column stats instead). */
  override def createGenerator(df: DataFrame, columns: Map[Int, String]): GeneratorState = {
    if (columns.isEmpty) return State(hypers, Map.empty, Map.empty, Map.empty)
    val aggs = columns.toSeq.sortBy(_._1).flatMap { case (colno, cname) =>
      val c = col(cname).cast("double")
      Seq(
        count(c).as(s"cnt_$colno"),
        coalesce(sum(c), lit(0.0)).as(s"sum_$colno"),
        coalesce(sum(c * c), lit(0.0)).as(s"sumsq_$colno"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val stats = columns.keys.toSeq.sorted.zipWithIndex.map { case (colno, i) =>
      colno -> ColStats(row.getLong(3 * i), row.getDouble(3 * i + 1), row.getDouble(3 * i + 2))
    }.toMap
    State(hypers, stats, Map.empty, Map.empty)
  }

  private def drawParams(stats: ColStats, rng: DetRng): ColParams = {
    val (mn, vn, an, bn) = posteriorHypers(hypers, stats)
    val newVar = rng.nextInvGamma(an, bn)
    val newMu = rng.gauss(mn, math.sqrt(newVar * vn))
    ColParams(newMu, math.sqrt(newVar))
  }

  override def initializeModels(state: GeneratorState, modelnos: Seq[Int],
      rng: DetRng): GeneratorState = {
    val s = state.asInstanceOf[State]
    val fresh = modelnos.map { mno =>
      mno -> s.cols.map { case (colno, st) => colno -> drawParams(st, rng) }
    }.toMap
    s.copy(models = s.models ++ fresh)
  }

  /** Conjugate: one Gibbs step reaches the posterior, iterations ignored
    * (reference: nig_normal.py analyze_models). */
  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState = {
    val s = state.asInstanceOf[State]
    val which = modelnos.getOrElse(s.modelNumbers)
    initializeModels(s, which, rng)
  }

  private def logpdf1(s: State, params: Map[Int, ColParams],
      colno: Int, x: Double): Double =
    if (colno < 0) {
      // latent deviation variable: Normal(0, sigma of observed col)
      val obs = s.deviations.getOrElse(colno,
        throw new NoSuchElementException(s"No deviation mapping for latent colno $colno"))
      logpdfGaussian(x, 0.0, params(obs).sigma)
    } else logpdfGaussian(x, params(colno).mu, params(colno).sigma)

  /** Ensemble logmeanexp of per-model joint logpdf; constraints are
    * irrelevant under column independence (reference: logpdf_joint note). */
  override def logpdfJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double = {
    val s = state.asInstanceOf[State]
    val which = modelnos.getOrElse(s.modelNumbers)
    val modelwise = which.toArray.map { mno =>
      val params = s.models(mno)
      targets.map { case (colno, x) => logpdf1(s, params, colno, x) }.sum
    }
    logMeanExp(modelwise)
  }

  // `accuracy` ignored: the NIG posterior-predictive draw is exact
  // (reference nig_normal.py:271-283 likewise ignores it).
  override def simulateJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], constraints: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng,
      accuracy: Option[Int] = None): Seq[Seq[Double]] = {
    val s = state.asInstanceOf[State]
    val which = modelnos.getOrElse(s.modelNumbers)
    val params = s.models(rng.choice(which))
    Seq.fill(numSamples)(targets.map { colno =>
      if (colno < 0) rng.gauss(0.0, params(s.deviations(colno)).sigma)
      else rng.gauss(params(colno).mu, params(colno).sigma)
    })
  }

  /** Mean of a randomly chosen model, confidence 1 (reference:
    * nig_normal.py predict_confidence; latent deviations → (0, 1)). */
  override def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, numSamples: Int, rng: DetRng): (Double, Double) = {
    val s = state.asInstanceOf[State]
    if (colno < 0) return (0.0, 1.0)
    val which = modelnos.getOrElse(s.modelNumbers)
    val params = s.models(rng.choice(which))
    (params(colno).mu, 1.0)
  }

  /** Columns are independent by construction (reference returns [0]). */
  override def columnDependenceProbability(state: GeneratorState,
      modelnos: Option[Seq[Int]], colno0: Int, colno1: Int): Seq[Double] = Seq(0.0)

  override def columnMutualInformation(state: GeneratorState,
      modelnos: Option[Seq[Int]], colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double] = Seq(0.0)

  override def dropModels(state: GeneratorState, modelnos: Seq[Int]): GeneratorState = {
    val s = state.asInstanceOf[State]
    s.copy(models = s.models -- modelnos)
  }

  override def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double] = Seq(0.0)

  // No latent row structure: relevance is degenerate like row_similarity
  // (reference nig_normal.py:376-379 returns [0] — "XXX Fix me").
  override def predictiveRelevance(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowidTarget: Long, rowidQuery: Seq[Long],
      hypotheticals: Seq[Seq[(Int, Double)]], colno: Int): Seq[Double] = Seq(0.0)
}

/** IID standard Gaussian toy backend (reference: src/backends/iid_gaussian.py). */
class StdNormalBackend extends Backend {
  import NigNormalBackend.logpdfGaussian

  final case class State(columns: Set[Int], nModels: Int) extends GeneratorState {
    def modelNumbers: Seq[Int] = 0 until nModels
  }

  override def name: String = "std_normal"

  override def createGenerator(df: DataFrame, columns: Map[Int, String]): GeneratorState =
    State(columns.keySet, 0)

  override def initializeModels(state: GeneratorState, modelnos: Seq[Int], rng: DetRng): GeneratorState = {
    val s = state.asInstanceOf[State]
    s.copy(nModels = math.max(s.nModels, if (modelnos.isEmpty) 0 else modelnos.max + 1))
  }

  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState = state

  override def logpdfJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double =
    targets.map { case (_, x) => logpdfGaussian(x, 0.0, 1.0) }.sum

  override def simulateJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], constraints: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng,
      accuracy: Option[Int] = None): Seq[Seq[Double]] =
    Seq.fill(numSamples)(targets.map(_ => rng.nextGaussian()))

  override def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, numSamples: Int, rng: DetRng): (Double, Double) = (0.0, 1.0)

  override def columnDependenceProbability(state: GeneratorState,
      modelnos: Option[Seq[Int]], colno0: Int, colno1: Int): Seq[Double] = Seq(0.0)

  override def columnMutualInformation(state: GeneratorState,
      modelnos: Option[Seq[Int]], colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double] = Seq(0.0)

  override def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double] = Seq(0.0)
}

/** Constant-9 troll backend (reference: src/backends/troll_rng.py):
  * simulate always returns 9; logpdf is 0 for 9, -inf otherwise, NaN if
  * any constraint is not 9. Useful for exact-value engine tests. */
class TrollBackend extends Backend {
  final case class State(nModels: Int) extends GeneratorState {
    def modelNumbers: Seq[Int] = 0 until nModels
  }

  override def name: String = "troll_rng"

  override def createGenerator(df: DataFrame, columns: Map[Int, String]): GeneratorState =
    State(0)

  override def initializeModels(state: GeneratorState, modelnos: Seq[Int], rng: DetRng): GeneratorState = {
    val s = state.asInstanceOf[State]
    s.copy(nModels = math.max(s.nModels, if (modelnos.isEmpty) 0 else modelnos.max + 1))
  }

  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState = state

  override def logpdfJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double = {
    if (constraints.exists(_._2 != 9.0)) Double.NaN
    else if (targets.exists(_._2 != 9.0)) Double.NegativeInfinity
    else 0.0
  }

  override def simulateJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], constraints: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng,
      accuracy: Option[Int] = None): Seq[Seq[Double]] =
    Seq.fill(numSamples)(targets.map(_ => 9.0))

  override def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, numSamples: Int, rng: DetRng): (Double, Double) = (9.0, 1.0)

  override def columnDependenceProbability(state: GeneratorState,
      modelnos: Option[Seq[Int]], colno0: Int, colno1: Int): Seq[Double] = Seq(0.0)

  override def columnMutualInformation(state: GeneratorState,
      modelnos: Option[Seq[Int]], colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double] = Seq(0.0)

  override def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double] = Seq(0.0)
}
