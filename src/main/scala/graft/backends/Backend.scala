package graft.backends

import org.apache.spark.sql.DataFrame

/** One posterior sample of all latent parameters — an ensemble member
  * (reference: doc/bql.rst:269-279). Concrete shape is backend-specific;
  * must be serializable so the ensemble can be broadcast to executors. */
trait ModelState extends Serializable

/** Serializable per-generator model container: suff stats + ensemble.
  * Broadcast to executors for per-row estimator evaluation; tiny next to
  * the data (O(columns × models)). */
trait GeneratorState extends Serializable {
  def modelNumbers: Seq[Int]

  /** For categorical columns: colno → ordered category labels; the code
    * of a label is its index (reference: bayesdb_cgpm_category dictionary
    * encoding, src/backends/cgpm_backend.py:61-68,1263-1310). Numeric-only
    * backends leave it empty. */
  def categoryCodes: Map[Int, IndexedSeq[String]] = Map.empty
}

/** The generative-model backend interface (reference: src/backend.py:86-297).
  *
  * Differences from the reference, forced by the distributed setting:
  *  - state is an explicit immutable value (no SQLite side tables); every
  *    mutation returns a new state — rollback = keeping the old reference.
  *  - sampling methods take a DetRng so draws are pure functions of
  *    (seed, rowid, modelno, callsite) and survive Spark task retries.
  *  - fitting (`createGenerator`) receives the base DataFrame and must
  *    reduce it distributedly (suff stats via one agg, never collect()).
  *
  * Values are Doubles in v1: the shipped numeric backends (nig_normal,
  * std_normal, troll_rng) model numerical variables only; categorical
  * values enter with the CrossCat backend via per-generator category
  * codes (reference: src/backends/cgpm_backend.py:61-68).
  */
trait Backend extends Serializable {

  /** BQL name, e.g. "nig_normal" (casefolded). */
  def name: String

  /** Fit per-column sufficient statistics over the base table — one
    * distributed aggregation. `columns` maps colno -> column name. */
  def createGenerator(df: DataFrame, columns: Map[Int, String]): GeneratorState

  /** Stattype-aware fit: `nominalCols` lists the colnos to model as
    * categorical (dictionary-encoded). Numeric-only backends ignore it. */
  def createGenerator(df: DataFrame, columns: Map[Int, String],
      nominalCols: Set[Int]): GeneratorState = createGenerator(df, columns)

  /** Draw initial ensemble members for the given model numbers. */
  def initializeModels(state: GeneratorState, modelnos: Seq[Int], rng: DetRng): GeneratorState

  /** Posterior inference. For conjugate backends one step reaches the
    * posterior; MCMC backends iterate. Per-model work is independent —
    * the CrossCat implementation fans models out via parallelize. */
  def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState

  /** Variable-targeted analysis (the reference's `ANALYZE ... (VARIABLES
    * x, y)` / `(SKIP z)` program, cgpm_backend.py:1797-1888): restrict
    * transitions to the given colnos. Default ignores the restriction
    * (conjugate backends transition all columns in one step anyway). */
  def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng,
      variables: Option[Seq[Int]]): GeneratorState =
    analyzeModels(state, modelnos, iterations, rng)

  /** Full analysis program (VARIABLES/SKIP + ROWS + SUBPROBLEMS,
    * reference cgpm_backend.py:1797-1888 → engine.transition kernels).
    * Default honors only the variable restriction. */
  def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng, program: AnalyzeProgram): GeneratorState =
    analyzeModels(state, modelnos, iterations, rng, program.variables)

  /** Log joint density of `targets` = (colno, value) given `constraints`,
    * averaged over the ensemble in log space (logmeanexp). */
  def logpdfJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double

  /** Draw `numSamples` joint rows of the target columns. Model chosen
    * uniformly (constraint-likelihood weighting happens in the engine
    * layer, reference: src/bqlfn.py:555-572).
    *
    * `accuracy` is the `SIMULATE ... ACCURACY n` knob (reference:
    * src/backend.py:263-266 — "a generic parameter which specifies the
    * desired accuracy / compute time if the simulations are
    * APPROXIMATELY distributed from the true target"). Backends whose
    * constrained draw is exact/closed-form (nig_normal, loom's mixture
    * draw, baseline CrossCat's per-view categorical) ignore it, exactly
    * as the reference's nig_normal does; CrossCat's foreign-composition
    * network multiplies its importance-sampling proposal width by it. */
  def simulateJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], constraints: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng,
      accuracy: Option[Int] = None): Seq[Seq[Double]]

  /** Draw targets conditioned on an existing table row (reference:
    * `SIMULATE ... GIVEN rowid = r`, tests/test_simulate.py:79-260).
    * `rowValues` are the row's observed cells (targets excluded);
    * `constraints` are the explicit extra givens. Default: the observed
    * cells join the constraints (the unincorporated-row semantics);
    * backends with per-row latent structure override to condition on it.
    * `accuracy` as in [[simulateJoint]]. */
  def simulateJointGivenRow(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], rowid: Long, rowValues: Seq[(Int, Double)],
      constraints: Seq[(Int, Double)], numSamples: Int,
      rng: DetRng, accuracy: Option[Int] = None): Seq[Seq[Double]] = {
    val merged = constraints ++ rowValues.filterNot { case (c, _) =>
      constraints.exists(_._1 == c) }
    simulateJoint(state, modelnos, targets, merged, numSamples, rng, accuracy)
  }

  /** Impute a value + confidence for one cell (reference:
    * src/backend.py:233-245). */
  def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, numSamples: Int, rng: DetRng): (Double, Double)

  /** Row-conditioned imputation (reference: bql_predict keys on rowid —
    * cgpm conditions on the row's latent structure or its observed
    * cells). `rowValues` are the row's other observed cells. Default:
    * the marginal — correct for backends whose columns are independent
    * (nig_normal family); joint backends override. */
  def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, rowid: Long, rowValues: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng): (Double, Double) =
    predictConfidence(state, modelnos, colno, numSamples, rng)

  /** Per-model dependence indicator between two columns (reference:
    * src/backend.py:204-207). */
  def columnDependenceProbability(state: GeneratorState,
      modelnos: Option[Seq[Int]], colno0: Int, colno1: Int): Seq[Double]

  /** Per-model Monte-Carlo mutual information estimate, optionally
    * conditional: `constraints` pairs are (colno, Some(value)) for
    * equality conditioning and (colno, None) for marginalized conditions
    * — `GIVEN (c)` without a value (reference: src/backend.py:209-212,
    * marginal encoding src/parse.py:661-664). */
  def columnMutualInformation(state: GeneratorState, modelnos: Option[Seq[Int]],
      colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double]

  /** Reject ANALYZE options the backend does not support, before any
    * inference work runs (reference: loom_backend.py:420-431 raises on
    * seconds budgets and checkpoints). Default accepts everything the
    * grammar does. */
  def checkAnalyzeOptions(seconds: Option[Int], ckptIterations: Option[Int],
      ckptSeconds: Option[Int]): Unit = ()

  /** Whether PREDICTIVE RELEVANCE accepts hypothetical rows. Checked at
    * plan time so the rejection is a clean driver-side error, not a task
    * failure (reference: loom_backend.py:688-692 raises before work). */
  def supportsHypotheticalRelevance: Boolean = true

  /** Drop a subset of ensemble members (reference: src/backend.py
    * drop_models). Backends without per-model state may not support it. */
  def dropModels(state: GeneratorState, modelnos: Seq[Int]): GeneratorState =
    throw new UnsupportedOperationException(
      s"Backend $name does not support dropping model subsets")

  /** Per-model row-pair similarity in the context of given columns,
    * keyed by rowid like the cgpm engine (reference: src/backend.py:214-217,
    * src/backends/cgpm_backend.py:740-762). */
  def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double]

  /** Per-model predictive relevance of a target row to a set of existing
    * rows and/or hypothetical rows (reference: src/backend.py:219-230,
    * cgpm_backend.py:764-838). Backends without latent row structure may
    * not implement it (reference raises NotImplementedError). */
  def predictiveRelevance(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowidTarget: Long, rowidQuery: Seq[Long],
      hypotheticals: Seq[Seq[(Int, Double)]], colno: Int): Seq[Double] =
    throw new UnsupportedOperationException(
      s"Backend $name does not implement PREDICTIVE RELEVANCE")
}

/** Parsed `ANALYZE (...)` program (reference: cgpm_analyze grammar —
  * VARIABLES/SKIP resolve to colnos upstream; ROWS are table rowids;
  * SUBPROBLEMS use the reference's canonical names,
  * cgpm_backend.py:1420-1464). */
final case class AnalyzeProgram(
    variables: Option[Seq[Int]] = None,
    rows: Option[Seq[Long]] = None,
    subproblems: Option[Seq[String]] = None)

object AnalyzeProgram {
  val Subproblems: Set[String] = Set(
    "variable_hyperparameters", "variable_clustering",
    "variable_clustering_concentration", "row_clustering",
    "row_clustering_concentration")
}

object Backends {
  /** Registry by casefolded name (reference: src/__init__.py:94-96 —
    * cgpm is the reference default; ours arrives with the CrossCat port). */
  def byName(name: String): Backend = name.toLowerCase match {
    case "cgpm" | "crosscat" => new CrossCatBackend()
    case "loom" => new LoomBackend()
    case "nig_normal" => new NigNormalBackend()
    case "std_normal" => new StdNormalBackend()
    case "troll_rng"  => new TrollBackend()
    case other => throw new IllegalArgumentException(s"Unknown backend: $other")
  }
}
