package graft.backends

import graft.backends.ForeignCgpm.ForeignSpec

/** Native re-implementation of the reference's Loom backend
  * (reference: src/backends/loom_backend.py:1-1017).
  *
  * The reference backend is an adapter around the external `loom` server
  * — another CrossCat implementation — so its *inference* is the same
  * model family our [[CrossCatBackend]] already fits; what is distinctive
  * about it is the query-side contract it exposes to BQL:
  *
  *  - INITIALIZE runs one inference pass immediately, so kind/partition
  *    estimators work before any explicit ANALYZE
  *    (loom_backend.py:339-356: initialize_models → analyze_models(1)).
  *  - ANALYZE rejects model subsets, seconds budgets, checkpoints and
  *    analysis programs (loom_backend.py:420-431).
  *  - DROP MODELS rejects specific model numbers — loom can only clear
  *    the whole sample set (loom_backend.py:392-396).
  *  - PREDICTIVE RELEVANCE rejects hypothetical rows — loom cannot
  *    incorporate unseen rows (loom_backend.py:688-692) — and computes a
  *    per-model same-partition indicator from the stored kind/row
  *    partitions (loom_backend.py:693-708), which our existing-row path
  *    already is.
  *  - SIMILARITY requires exactly one context column
  *    (loom_backend.py:660-663 `assert len(colnos) == 1`).
  *  - SIMULATE GIVEN an existing rowid conditions on the row's observed
  *    cells only (loom re-encodes them as a conditioning row for its
  *    query server, never the row's latent cluster) and raises when an
  *    explicit constraint overlaps an observed cell
  *    (loom_backend.py:742-771).
  *  - MUTUAL INFORMATION is pooled across the ensemble into a single
  *    estimate — loom's query server averages over all samples
  *    internally (loom_backend.py:623-659 returns `[mean]`).
  *
  * Everything else (dependence probability as a same-kind indicator,
  * categorical mode / numerical-mean-with-zero-confidence imputation,
  * logpdf as a score difference) matches the CrossCat semantics this
  * class inherits. No external server, store path, or ingest round-trip
  * exists here: the ensemble is the same broadcastable immutable state
  * the cgpm backend uses, so loom generators scale identically.
  */
class LoomBackend extends CrossCatBackend(foreigns = Nil) {

  override def name: String = "loom"

  /** Loom runs one inference pass at INITIALIZE (loom_backend.py:355-356),
    * so the kind/row partitions its estimators read always exist. */
  override def initializeModels(state: GeneratorState, modelnos: Seq[Int],
      rng: DetRng): GeneratorState =
    super.analyzeModels(super.initializeModels(state, modelnos, rng),
      None, 1, rng, AnalyzeProgram())

  /** Loom analyzes the whole sample set or nothing
    * (loom_backend.py:430-431). */
  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState = {
    if (modelnos.isDefined)
      throw new IllegalArgumentException(
        "Loom cannot analyze specific model numbers.")
    // jump straight to the super implementation: the 4-arg super entry
    // re-dispatches virtually through the program overload, which this
    // class overrides — that path would recurse
    super.analyzeModels(state, modelnos, iterations, rng, AnalyzeProgram())
  }

  /** Loom analyze does not support programs (loom_backend.py:428-429). */
  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng, program: AnalyzeProgram): GeneratorState = {
    if (program != AnalyzeProgram())
      throw new IllegalArgumentException("Loom analyze does not support programs.")
    analyzeModels(state, modelnos, iterations, rng)
  }

  override def checkAnalyzeOptions(seconds: Option[Int],
      ckptIterations: Option[Int], ckptSeconds: Option[Int]): Unit = {
    if (seconds.isDefined)
      throw new IllegalArgumentException(
        "Loom analyze does not support number of seconds.")
    if (ckptIterations.isDefined || ckptSeconds.isDefined)
      throw new IllegalArgumentException(
        "Loom analyze does not support checkpoint.")
  }

  /** Loom clears all samples or none (loom_backend.py:392-396). */
  override def dropModels(state: GeneratorState, modelnos: Seq[Int]): GeneratorState =
    throw new IllegalArgumentException("Loom cannot drop specific model numbers.")

  /** Same-partition indicator in the kind of exactly ONE context column
    * (loom_backend.py:660-663). */
  override def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double] = {
    require(colnos.length == 1,
      "Loom row similarity requires exactly one context column")
    super.rowSimilarity(state, modelnos, rowid0, rowid1, colnos)
  }

  override def supportsHypotheticalRelevance: Boolean = false

  /** Existing-rows-only relevance (loom_backend.py:688-692). */
  override def predictiveRelevance(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowidTarget: Long, rowidQuery: Seq[Long],
      hypotheticals: Seq[Seq[(Int, Double)]], colno: Int): Seq[Double] = {
    if (hypotheticals.nonEmpty)
      throw new IllegalArgumentException(
        "Loom cannot handle hypothetical rows because it is unable to" +
          " insert rows into CrossCat")
    super.predictiveRelevance(state, modelnos, rowidTarget, rowidQuery,
      hypotheticals, colno)
  }

  /** Condition on the row's observed CELLS, not its latent cluster, and
    * reject constraint/observation overlap (loom_backend.py:742-771).
    * Observedness is read from the incorporated data (the reference reads
    * the base-table row; for rows outside the MCMC subsample the explicit
    * rowValues stand in — the engine already strips constrained columns
    * from them, so only incorporated rows can surface the overlap). */
  override def simulateJointGivenRow(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], rowid: Long, rowValues: Seq[(Int, Double)],
      constraints: Seq[(Int, Double)], numSamples: Int,
      rng: DetRng, accuracy: Option[Int] = None): Seq[Seq[Double]] = {
    val st = state.asInstanceOf[CrossCat.CrossCatState]
    val idx = st.rowIdx(rowid)
    val observed = rowValues.map(_._1).toSet
    val overlap = constraints.exists { case (c, _) =>
      observed(c) || (idx >= 0 && {
        val j = st.colnos.indexOf(c)
        j >= 0 && !st.data(j)(idx).isNaN
      })
    }
    if (overlap)
      throw new IllegalArgumentException(
        "Overlap between constraints and target row in simulate.")
    simulateJoint(state, modelnos, targets, constraints ++ rowValues,
      numSamples, rng, accuracy)
  }

  /** One pooled ensemble estimate, as loom's query server returns
    * (loom_backend.py:650-659). */
  override def columnMutualInformation(state: GeneratorState, modelnos: Option[Seq[Int]],
      colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double] = {
    val perModel = super.columnMutualInformation(state, modelnos, colnos0,
      colnos1, constraints, numSamples, rng)
    Seq(perModel.sum / perModel.length)
  }
}
