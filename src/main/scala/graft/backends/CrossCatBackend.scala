package graft.backends

import graft.functions.SpecialMath.{lgamma, logMeanExp, logSumExp}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CrossCat — the reference's default model (registered as the `cgpm`
  * backend, reference: src/__init__.py:94-96, src/backends/cgpm_backend.py;
  * the underlying engine lives in the external public `cgpm` package).
  * Written fresh in Scala from the published model family:
  *
  *   - CRP partition of COLUMNS into views (concentration `alpha`);
  *   - per view, CRP partition of ROWS into clusters (`viewAlpha`);
  *   - per (column, cluster), a conjugate component model:
  *     Normal–Inverse-Gamma for numerical columns (posterior predictive
  *     student-t in closed form), symmetric-Dirichlet categorical for
  *     nominal columns (dictionary-encoded category codes, reference:
  *     bayesdb_cgpm_category) — `_DEFAULT_DIST` in the reference
  *     (cgpm_backend.py:1905-1912) makes the same two choices.
  *
  * ANALYZE runs the reference's five Gibbs subproblems (names from
  * cgpm_backend.py:1425-1446): column_hypers (grid Gibbs), columns
  * (view reassignment, Neal algorithm-8 with one auxiliary view), alpha,
  * rows (per-view cluster reassignment), view_alphas. Models are
  * independent → ANALYZE fans the ensemble out with `parallelize(models)`
  * (the Spark analogue of the reference's multiprocessing pool,
  * cgpm_backend.py:103-145).
  *
  * Scale design: MCMC state is fit on a bounded row subsample collected
  * to the driver (the reference's `SUBSAMPLE` clause does the same,
  * cgpm_backend.py:189-205); all per-row query estimators run as UDFs
  * over the broadcast fitted state, so query cost is independent of the
  * subsample and distributed over the full table.
  */
class CrossCatBackend(
    val subsampleRows: Int = 500,
    val gridSize: Int = 15,
    val maxCategories: Int = 256,
    val foreigns: Seq[ForeignCgpm.ForeignSpec] = Nil) extends Backend {

  import CrossCat._
  import ForeignCgpm.{ForeignSpec, ForeignPredictor}

  /** Foreign specs in dependency order: a node reading another node's
    * output comes after it (reference: cgpm builds the same DAG in its
    * network module; cycles are a schema error). */
  private val topoForeigns: IndexedSeq[ForeignSpec] = {
    val remaining = scala.collection.mutable.ArrayBuffer(foreigns: _*)
    val placed = scala.collection.mutable.ArrayBuffer.empty[ForeignSpec]
    val dupOut = foreigns.flatMap(_.outputs).groupBy(identity)
      .collect { case (c, vs) if vs.size > 1 => c }
    require(dupOut.isEmpty,
      s"multiple OVERRIDE MODEL clauses claim output column(s) ${dupOut.mkString(", ")}")
    val producedBy = foreigns.flatMap(f => f.outputs.map(_ -> f)).toMap
    while (remaining.nonEmpty) {
      val next = remaining.find(f => f.inputs.forall(i =>
        !producedBy.contains(i) || placed.exists(_.outputs.contains(i))))
      next match {
        case Some(f) => placed += f; remaining -= f
        case None => throw new IllegalArgumentException(
          "OVERRIDE MODEL clauses form a cycle")
      }
    }
    placed.toIndexedSeq
  }

  override def name: String = "cgpm"

  override def createGenerator(df: DataFrame, columns: Map[Int, String]): GeneratorState =
    createGenerator(df, columns, Set.empty)

  override def createGenerator(df: DataFrame, columns: Map[Int, String],
      nominalCols: Set[Int]): GeneratorState = {
    val colnos = columns.keys.toIndexedSeq.sorted
    val names = colnos.map(columns)
    // dictionary-encode nominal columns: distinct values by frequency
    // (deterministic tie-break on the value). ONE table scan for ALL
    // columns: melt to (column-index, value) via posexplode, a single
    // distributed groupBy, then per-column top-K over the tiny
    // (columns × categories) aggregate — a 64-nominal-column population
    // costs one job, not 64 sequential scans.
    val nomColnos = colnos.filter(nominalCols)
    val cats: Map[Int, IndexedSeq[String]] =
      if (nomColnos.isEmpty) Map.empty
      else {
        import org.apache.spark.sql.expressions.Window
        val melted = df
          .select(posexplode(array(
            nomColnos.map(c => col(columns(c)).cast("string")): _*)).as(Seq("ci", "v")))
          .filter(col("v").isNotNull)
          .groupBy("ci", "v").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("ci").orderBy(col("n").desc, col("v").asc)
        val top = melted
          .select(col("ci"), col("v"), row_number().over(w).as("r"))
          .filter(col("r") <= maxCategories)
          .collect()
        val byCol = top.groupBy(_.getInt(0))
        nomColnos.zipWithIndex.map { case (c, i) =>
          c -> byCol.getOrElse(i, Array.empty[org.apache.spark.sql.Row])
            .sortBy(_.getInt(2)).map(_.getString(1)).toIndexedSeq
        }.toMap
      }
    val colTypes: IndexedSeq[ColType] = colnos.map { c =>
      if (nominalCols(c)) CategoricalCol(math.max(cats(c).length, 1))
      else NumericalCol
    }
    val hasRowid = df.columns.exists(_.equalsIgnoreCase("rowid"))
    // bounded UNIFORM subsample for MCMC (the reference reservoir-samples
    // its SUBSAMPLE, cgpm_backend.py:189-205 — a first-N prefix would bias
    // every estimator on ingest-ordered data). Seeded xxhash64 of the
    // rowid makes the selected SET a deterministic function of the rowid
    // values alone — invariant under input partitioning/order, retry-safe
    // — and orderBy+limit plans as one TakeOrderedAndProject pass.
    // Nominal columns travel as strings and are encoded on the driver.
    val selCols = names.zip(colTypes).map {
      case (n, NumericalCol) => col(n).cast("double").cast("string")
      case (n, _) => col(n).cast("string")
    }
    val sel = if (hasRowid) df.select((col("rowid").cast("double") +: selCols): _*)
                .orderBy(xxhash64(col("rowid").cast("long"), lit(CrossCatBackend.SubsampleSeed)))
              else df.select((lit(-1.0) +: selCols): _*)
    val rows = {
      val r0 = sel.limit(subsampleRows).collect()
      // canonical in-sample order: by rowid, so the fitted state is
      // identical no matter how the sample arrived
      if (hasRowid) r0.sortBy(_.getDouble(0)) else r0
    }
    val n = rows.length
    require(n > 0, "CrossCat needs at least one row")
    val rowids = Array.tabulate(n)(i =>
      if (hasRowid) rows(i).getDouble(0).toLong else (i + 1).toLong)
    val data = Array.ofDim[Double](colnos.length, n)
    for (i <- 0 until n; j <- colnos.indices) {
      val raw = rows(i).getString(j + 1)
      data(j)(i) = colTypes(j) match {
        case NumericalCol =>
          if (raw == null) Double.NaN else raw.toDouble
        case CategoricalCol(_) =>
          if (raw == null) Double.NaN
          else {
            val code = cats(colnos(j)).indexOf(raw)
            if (code < 0) Double.NaN else code.toDouble
          }
      }
    }
    // numerical column moments for hyper grids, over the FULL table
    val numNames = names.zip(colTypes).collect { case (nm, NumericalCol) => nm }
    val moments: IndexedSeq[ColMoments] =
      if (numNames.isEmpty) colnos.map(_ => ColMoments(0, 1, 0, 1))
      else {
        val aggs = numNames.flatMap { c =>
          val d = col(c).cast("double")
          Seq(avg(d), variance(d), min(d), max(d))
        }
        val stats = df.agg(aggs.head, aggs.tail: _*).head()
        var k = -1
        colnos.indices.map { j =>
          colTypes(j) match {
            case NumericalCol =>
              k += 1
              def g(p: Int): Double = {
                val v = stats.get(k * 4 + p)
                if (v == null) 0.0 else v.asInstanceOf[Double]
              }
              ColMoments(g(0), math.max(g(1), 1e-6), g(2), g(3))
            case _ => ColMoments(0, 1, 0, 1)
          }
        }
      }
    if (foreigns.isEmpty)
      CrossCatState(columns, colnos, colTypes, cats, data, rowids, moments, IndexedSeq.empty)
    else {
      // foreign-output columns leave the baseline CrossCat structure
      // (reference: _create_schema removes them from `variables`); their
      // subsample data is kept aside for predictor fits
      val fOut = foreigns.flatMap(_.outputs).toSet
      val bIdx = colnos.indices.filterNot(j => fOut(colnos(j)))
      val fIdx = colnos.indices.filter(j => fOut(colnos(j)))
      require(bIdx.nonEmpty, "composition needs at least one baseline variable")
      CrossCatState(columns, bIdx.map(colnos), bIdx.map(colTypes), cats,
        bIdx.map(data).toArray, rowids, bIdx.map(moments), IndexedSeq.empty,
        foreignSpecs = topoForeigns,
        foreignData = fIdx.map(j => colnos(j) -> data(j)).toMap)
    }
  }

  override def initializeModels(state: GeneratorState, modelnos: Seq[Int],
      rng: DetRng): GeneratorState = {
    val st = state.asInstanceOf[CrossCatState]
    val base = rng.nextLong()
    val fresh = modelnos.filterNot(m => st.models.exists(_.modelno == m)).map { m =>
      val m0 = initModel(st, m, DetRng(base, m.toLong))
      if (st.foreignSpecs.isEmpty) m0
      else m0.copy(foreign = fitForeign(st, DetRng(base, 0xf04e16L, m.toLong)))
    }
    st.copy(models = (st.models ++ fresh).sortBy(_.modelno))
  }

  /** Fit every foreign predictor on the subsample (complete-case inside
    * each predictor; latent colnos have no data column and fall back to
    * the prior). The rng drives per-model posterior draws. */
  private def fitForeign(st: CrossCatState, rng: DetRng): IndexedSeq[ForeignPredictor] = {
    val data: Map[Int, Array[Double]] =
      st.colnos.zipWithIndex.map { case (c, j) => c -> st.data(j) }.toMap ++ st.foreignData
    val dims: Map[Int, Int] = st.colnos.zipWithIndex.map { case (c, j) =>
      c -> (st.colTypes(j) match { case CategoricalCol(k) => k; case _ => 1 })
    }.toMap
    st.foreignSpecs.zipWithIndex.map { case (sp, i) =>
      ForeignCgpm.fit(sp, data, dims, DetRng(rng.nextLong(), i.toLong))
    }
  }

  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng): GeneratorState =
    analyzeModels(state, modelnos, iterations, rng, None)

  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng,
      variables: Option[Seq[Int]]): GeneratorState =
    analyzeModels(state, modelnos, iterations, rng, AnalyzeProgram(variables = variables))

  override def analyzeModels(state: GeneratorState, modelnos: Option[Seq[Int]],
      iterations: Int, rng: DetRng, program: AnalyzeProgram): GeneratorState = {
    val st = state.asInstanceOf[CrossCatState]
    val which = modelnos.getOrElse(st.models.map(_.modelno))
    // VARIABLES restriction: colIdx set whose kernels transition
    val restrict = program.variables.map(_.map(st.colIdx).toSet)
    // ROWS restriction: subsample indices. A listed rowid that is not
    // incorporated in the MCMC subsample is an ERROR, as in the
    // reference (tests/test_cgpm_analysis.py:106-120 expects BQLError
    // for rows outside the population or subsample)
    val rowRestrict = program.rows.map { rs =>
      val idx = rs.map(r => r -> st.rowIdx(r))
      val bad = idx.collect { case (r, i) if i < 0 => r }
      require(bad.isEmpty,
        "ANALYZE ROWS not incorporated in the subsample: " +
          bad.sorted.mkString(", "))
      idx.map(_._2).toSet
    }
    val kernels = program.subproblems.map { names =>
      val bad = names.filterNot(AnalyzeProgram.Subproblems)
      require(bad.isEmpty, s"Invalid subproblems: ${bad.mkString(", ")}")
      names.toSet
    }
    val seedBase = rng.nextLong()
    def transitionOne(m: CrossCatModel): CrossCatModel =
      if (!which.contains(m.modelno)) m
      else {
        var cur = m
        for (sweep <- 0 until iterations)
          cur = transition(st, cur, DetRng(seedBase, m.modelno.toLong, sweep.toLong),
            restrict, rowRestrict, kernels)
        // foreign predictors re-draw from their posterior each ANALYZE
        // (reference: composed CGPMs transition alongside the baseline)
        if (st.foreignSpecs.nonEmpty)
          cur = cur.copy(foreign =
            fitForeign(st, DetRng(seedBase, 0xf04e16L, m.modelno.toLong)))
        cur
      }
    // per-model parallel ANALYZE: models are independent posterior chains
    val models: IndexedSeq[CrossCatModel] =
      if (st.models.length >= 4 && SparkSession.getActiveSession.isDefined) {
        val sc = SparkSession.active.sparkContext
        sc.parallelize(st.models, st.models.length).map(transitionOne).collect().toIndexedSeq
      } else st.models.map(transitionOne)
    st.copy(models = models)
  }

  override def logpdfJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double = {
    val st = state.asInstanceOf[CrossCatState]
    val ms = select(st, modelnos)
    val touchesForeign = (targets.map(_._1) ++ constraints.map(_._1))
      .exists(st.foreignCols)
    if (!touchesForeign)
      logMeanExp(ms.map(m => modelLogpdf(st, m, targets, constraints)).toArray)
    else
      logMeanExp(ms.map(m => networkLogpdf(st, m, targets, constraints)).toArray)
  }

  /** `accuracy` reaches only the approximate path: the baseline draw is
    * an exact per-view categorical + component sample, so extra compute
    * cannot improve it (the reference's cgpm engine likewise spends
    * accuracy only on its approximate constrained sampler); the
    * foreign-composition network is importance sampling, where accuracy
    * multiplies the proposal width ([[networkSimulate]]). */
  override def simulateJoint(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], constraints: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng,
      accuracy: Option[Int] = None): Seq[Seq[Double]] = {
    val st = state.asInstanceOf[CrossCatState]
    val ms = select(st, modelnos)
    val touchesForeign = (targets ++ constraints.map(_._1)).exists(st.foreignCols)
    (0 until numSamples).map { _ =>
      val m = ms(rng.nextInt(ms.length))
      if (!touchesForeign) simulateOne(st, m, targets, constraints, rng)
      else networkSimulate(st, m, targets, constraints, rng, accuracy)
    }
  }

  /** GIVEN rowid = r: an incorporated row conditions the draw on its
    * latent cluster per view (columns are conditionally independent
    * given the cluster, so validated extra givens add nothing more);
    * an unincorporated row falls back to observed-cells-as-constraints
    * (reference: tests/test_simulate.py:79-260 semantics). */
  override def simulateJointGivenRow(state: GeneratorState, modelnos: Option[Seq[Int]],
      targets: Seq[Int], rowid: Long, rowValues: Seq[(Int, Double)],
      constraints: Seq[(Int, Double)], numSamples: Int,
      rng: DetRng, accuracy: Option[Int] = None): Seq[Seq[Double]] = {
    val st = state.asInstanceOf[CrossCatState]
    val idx = st.rowIdx(rowid)
    if (idx < 0)
      return super.simulateJointGivenRow(state, modelnos, targets, rowid,
        rowValues, constraints, numSamples, rng, accuracy)
    require(targets.forall(c => !st.foreignCols(c)),
      "SIMULATE GIVEN rowid supports baseline CrossCat targets" +
        " (foreign/latent outputs have no per-row cluster)")
    // a constraint may not override an observed (incorporated) cell
    constraints.foreach { case (c, _) =>
      if (!st.foreignCols(c)) {
        val j = st.colIdx(c)
        require(st.data(j)(idx).isNaN,
          s"Cannot override observed cell of rowid $rowid: ${st.columns(c)}")
      }
    }
    // Baseline constraints on UNOBSERVED cells carry no information once
    // the row's cluster is fixed (cells are conditionally independent
    // given the cluster), so the cluster draw already conditions on them.
    // Foreign-output constraints DO inform baseline targets (through the
    // predictor's inputs): route those through the network with the
    // row's cluster-conditioned baseline as the proposal and resample by
    // the foreign constraints' likelihood.
    val foreignCons = constraints.filter { case (c, _) => st.foreignCols(c) }
    val ms = select(st, modelnos)
    def clusterDraw(m: CrossCatModel, j: Int): Double = {
      val v = m.viewOf(j)
      val z = m.rowAssign(v)(idx)
      val w = workspace(st, m, v)
      w.suff(w.cols.indexOf(j)).sample(z, m.hypers(j), rng)
    }
    if (foreignCons.isEmpty)
      (0 until numSamples).map { _ =>
        val m = ms(rng.nextInt(ms.length))
        targets.map(c => clusterDraw(m, st.colIdx(c)))
      }
    else {
      val evalByNode: Map[ForeignSpec, Seq[(Int, Double)]] =
        foreignCons.groupBy { case (c, _) =>
          st.foreignSpecs.find(_.outputs.contains(c)).getOrElse(
            throw new IllegalArgumentException(s"No foreign node produces colno $c"))
        }
      val tset = targets.toSet
      val width = networkWidth(accuracy)
      (0 until numSamples).map { _ =>
        val m = ms(rng.nextInt(ms.length))
        val draws = (0 until width).map { _ =>
          // proposal: every baseline cell — observed value if present,
          // else a draw from the row's cluster component; TARGET cells
          // always redraw from the cluster (posterior predictive for the
          // row, matching the foreign-free path)
          val baseVals: Map[Int, Double] = st.colnos.zipWithIndex.map { case (c, j) =>
            val obs = st.data(j)(idx)
            c -> (if (obs.isNaN || tset(c)) clusterDraw(m, j) else obs)
          }.toMap
          networkForward(st, m, Set.empty, baseVals, evalByNode, rng)
        }
        val pick = rng.logCategorical(draws.map(_._2).toIndexedSeq)
        targets.map(draws(pick)._1)
      }
    }
  }

  override def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, numSamples: Int, rng: DetRng): (Double, Double) = {
    val st = state.asInstanceOf[CrossCatState]
    imputeFrom(st, colno,
      simulateJoint(state, modelnos, Seq(colno), Nil, numSamples, rng).map(_.head))
  }

  /** Row-conditioned imputation: incorporated rows use their cluster,
    * fresh rows condition on their observed cells (reference: cgpm
    * predict → impute over the row-conditional). */
  override def predictConfidence(state: GeneratorState, modelnos: Option[Seq[Int]],
      colno: Int, rowid: Long, rowValues: Seq[(Int, Double)],
      numSamples: Int, rng: DetRng): (Double, Double) = {
    val st = state.asInstanceOf[CrossCatState]
    val ev = rowValues.filterNot(_._1 == colno)
    val samples =
      if (st.foreignCols(colno))
        // foreign target: condition through the network on the cells
        simulateJoint(state, modelnos, Seq(colno), ev, numSamples, rng).map(_.head)
      else simulateJointGivenRow(state, modelnos, Seq(colno), rowid, ev, Nil,
        numSamples, rng).map(_.head)
    imputeFrom(st, colno, samples)
  }

  private def imputeFrom(st: CrossCatState, colno: Int,
      samples: Seq[Double]): (Double, Double) = {
    val colType =
      if (st.foreignCols(colno)) NumericalCol  // foreign outputs are numerical
      else st.colTypes(st.colIdx(colno))
    colType match {
      case CategoricalCol(_) =>
        // nominal: mode + mode share (reference cgpm_backend.py:842-847)
        val counts = samples.groupBy(identity).view.mapValues(_.length)
        val (mode, cnt) = counts.maxBy { case (v, c) => (c, -v) }
        (mode, cnt.toDouble / samples.length)
      case NumericalCol =>
        // numerical: mean, confidence 0 ("XXX Punt", cgpm_backend.py:850-853)
        (samples.sum / samples.length, 0.0)
    }
  }

  override def columnDependenceProbability(state: GeneratorState,
      modelnos: Option[Seq[Int]], colno0: Int, colno1: Int): Seq[Double] = {
    val st = state.asInstanceOf[CrossCatState]
    if (colno0 == colno1) return Seq(1.0)  // self-dependence shortcut
    if (st.foreignCols(colno0) || st.foreignCols(colno1))
      select(st, modelnos).map(m =>
        if (networkDependent(st, m, colno0, colno1)) 1.0 else 0.0)
    else {
      val j0 = st.colIdx(colno0)
      val j1 = st.colIdx(colno1)
      select(st, modelnos).map(m => if (m.viewOf(j0) == m.viewOf(j1)) 1.0 else 0.0)
    }
  }

  override def columnMutualInformation(state: GeneratorState, modelnos: Option[Seq[Int]],
      colnos0: Seq[Int], colnos1: Seq[Int],
      constraints: Seq[(Int, Option[Double])],
      numSamples: Int, rng: DetRng): Seq[Double] = {
    val st = state.asInstanceOf[CrossCatState]
    val equality = constraints.collect { case (c, Some(v)) => (c, v) }
    val marginal = constraints.collect { case (c, None) => c }
    val touchesForeign = (colnos0 ++ colnos1 ++ constraints.map(_._1))
      .exists(st.foreignCols)
    def sim(m: CrossCatModel, ts: Seq[Int], cs: Seq[(Int, Double)]): Seq[Double] =
      if (touchesForeign) networkSimulate(st, m, ts, cs, rng)
      else simulateOne(st, m, ts, cs, rng)
    def lp(m: CrossCatModel, ts: Seq[(Int, Double)], cs: Seq[(Int, Double)]): Double =
      if (touchesForeign) networkLogpdf(st, m, ts, cs)
      else modelLogpdf(st, m, ts, cs)
    select(st, modelnos).map { m =>
      val independent = !touchesForeign && marginal.isEmpty && {
        val views0 = colnos0.map(c => m.viewOf(st.colIdx(c))).toSet
        val views1 = colnos1.map(c => m.viewOf(st.colIdx(c))).toSet
        (views0 & views1).isEmpty
      }
      if (independent) 0.0
      else {
        // Monte-Carlo CMI: E[log p(x,y|c) - log p(x|c) - log p(y|c)];
        // marginalized conditions (GIVEN (c) without a value) are drawn
        // from the model per sample and conditioned on (reference:
        // src/bqlfn.py:297-326 semantics)
        val vals = (0 until numSamples).map { _ =>
          val margVals =
            if (marginal.isEmpty) Nil
            else marginal.zip(sim(m, marginal, equality))
          val cs = equality ++ margVals
          val xy = sim(m, colnos0 ++ colnos1, cs)
          val x = colnos0.zip(xy.take(colnos0.length))
          val y = colnos1.zip(xy.drop(colnos0.length))
          lp(m, x ++ y, cs) - lp(m, x, cs) - lp(m, y, cs)
        }
        math.max(vals.sum / numSamples, 0.0)
      }
    }
  }

  override def dropModels(state: GeneratorState, modelnos: Seq[Int]): GeneratorState = {
    val st = state.asInstanceOf[CrossCatState]
    st.copy(models = st.models.filterNot(m => modelnos.contains(m.modelno)))
  }

  // ---------------------------------------------- ALTER GENERATOR moves
  // (reference: cgpm_alter sub-language, cgpm_backend.py:396-556)

  /** ENSURE VARIABLES * DEPENDENT: collapse every model to one view.
    * `only` restricts every ensure transform to the listed model numbers
    * (ALTER GENERATOR ... MODELS (subset), reference cgpm_backend
    * per-model alter; tests/test_cgpm_alter.py:63-73). */
  def ensureAllDependent(state: GeneratorState,
      only: Option[Set[Int]] = None): GeneratorState =
    mapModels(state, only) { (st, m) =>
      val keep = m.viewOf(0)
      m.copy(viewOf = m.viewOf.map(_ => 0),
        viewAlpha = IndexedSeq(m.viewAlpha(keep)),
        rowAssign = IndexedSeq(m.rowAssign(keep)))
    }

  /** ENSURE VARIABLES * INDEPENDENT: one singleton view per column,
    * each seeded with the column's current view partition. */
  def ensureAllIndependent(state: GeneratorState,
      only: Option[Set[Int]] = None): GeneratorState =
    mapModels(state, only) { (st, m) =>
      m.copy(
        viewOf = st.colnos.indices,
        viewAlpha = st.colnos.indices.map(j => m.viewAlpha(m.viewOf(j))),
        rowAssign = st.colnos.indices.map(j => m.rowAssign(m.viewOf(j))))
    }

  /** ENSURE VARIABLES cols IN VIEW OF anchor. */
  def ensureInViewOf(state: GeneratorState, colnos: Seq[Int], anchor: Int,
      only: Option[Set[Int]] = None): GeneratorState =
    mapModels(state, only) { (st, m) =>
      val target = m.viewOf(st.colIdx(anchor))
      val moved = colnos.map(st.colIdx).toSet
      compactViews(m.copy(viewOf = m.viewOf.zipWithIndex.map {
        case (v, j) => if (moved(j)) target else v
      }))
    }

  /** ENSURE VARIABLES cols IN SINGLETON VIEW: each listed column moves
    * to its own fresh view seeded with its current partition. */
  def ensureSingleton(state: GeneratorState, colnos: Seq[Int],
      only: Option[Set[Int]] = None): GeneratorState =
    mapModels(state, only) { (st, m0) =>
      var m = m0
      colnos.map(st.colIdx).foreach { j =>
        val src = m.viewOf(j)
        m = compactViews(m.copy(
          viewOf = m.viewOf.updated(j, m.rowAssign.length),
          viewAlpha = m.viewAlpha :+ m.viewAlpha(src),
          rowAssign = m.rowAssign :+ m.rowAssign(src)))
      }
      m
    }

  /** ENSURE ROWS rows IN CLUSTER OF ROW anchor WITHIN VIEW OF col:
    * reassign the listed (incorporated) rows to the anchor row's cluster
    * in the view containing `colno`. */
  def ensureRowsInCluster(state: GeneratorState, rowids: Seq[Long],
      anchorRowid: Long, colno: Int,
      only: Option[Set[Int]] = None): GeneratorState =
    mapModels(state, only) { (st, m) =>
      val v = m.viewOf(st.colIdx(colno))
      val anchorIdx = st.rowIdx(anchorRowid)
      require(anchorIdx >= 0, s"Anchor rowid $anchorRowid is not incorporated")
      val target = m.rowAssign(v)(anchorIdx)
      val moved = rowids.map(st.rowIdx).filter(_ >= 0).toSet
      val assign = m.rowAssign(v).zipWithIndex.map {
        case (z, i) => if (moved(i)) target else z
      }
      // compact cluster ids emptied by the move
      val live = assign.distinct.sorted
      val remap = live.zipWithIndex.toMap
      m.copy(rowAssign = m.rowAssign.updated(v, assign.map(remap)))
    }

  private def mapModels(state: GeneratorState, only: Option[Set[Int]] = None)(
      f: (CrossCatState, CrossCatModel) => CrossCatModel): GeneratorState = {
    val st = state.asInstanceOf[CrossCatState]
    only.foreach { ns =>
      val known = st.models.map(_.modelno).toSet
      val missing = ns.diff(known)
      require(missing.isEmpty, s"No such models: ${missing.toSeq.sorted.mkString(", ")}")
    }
    st.copy(models = st.models.map(m =>
      if (only.forall(_.contains(m.modelno))) f(st, m) else m))
  }

  private def compactViews(m: CrossCatModel): CrossCatModel = {
    val live = m.rowAssign.indices.filter(v => m.viewOf.contains(v))
    val remap = live.zipWithIndex.toMap
    m.copy(viewOf = m.viewOf.map(remap),
      viewAlpha = live.map(m.viewAlpha),
      rowAssign = live.map(m.rowAssign))
  }

  override def rowSimilarity(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowid0: Long, rowid1: Long, colnos: Seq[Int]): Seq[Double] = {
    val st = state.asInstanceOf[CrossCatState]
    val i0 = st.rowIdx(rowid0)
    val i1 = st.rowIdx(rowid1)
    if (i0 < 0 || i1 < 0) return Seq(Double.NaN)  // not incorporated
    val j = st.colIdx(colnos.head)
    select(st, modelnos).map { m =>
      val v = m.viewOf(j)
      if (m.rowAssign(v)(i0) == m.rowAssign(v)(i1)) 1.0 else 0.0
    }
  }

  override def predictiveRelevance(state: GeneratorState, modelnos: Option[Seq[Int]],
      rowidTarget: Long, rowidQuery: Seq[Long],
      hypotheticals: Seq[Seq[(Int, Double)]], colno: Int): Seq[Double] = {
    val st = state.asInstanceOf[CrossCatState]
    val it = st.rowIdx(rowidTarget)
    if (it < 0) return Seq(Double.NaN)
    val j = st.colIdx(colno)
    val queryIdx = rowidQuery.map(st.rowIdx).filter(_ >= 0)
    select(st, modelnos).map { m =>
      val v = m.viewOf(j)
      val zt = m.rowAssign(v)(it)
      val w = workspace(st, m, v)
      // existing rows: cluster indicator; hypothetical rows: posterior
      // cluster membership probability of the target's cluster
      val existing = queryIdx.map(i => if (m.rowAssign(v)(i) == zt) 1.0 else 0.0)
      val hypo = hypotheticals.map { row =>
        val inView = row.filter { case (c, _) => m.viewOf(st.colIdx(c)) == v }
        val logw = clusterLogWeights(st, m, v, w, inView.map { case (c, x) => (st.colIdx(c), x) })
        val mx = logSumExp(logw.toArray)
        math.exp(logw(zt) - mx)
      }
      val all = existing ++ hypo
      if (all.isEmpty) Double.NaN else all.sum / all.length
    }
  }

  // ------------------------------------------------------------ internals

  private def select(st: CrossCatState, modelnos: Option[Seq[Int]]): IndexedSeq[CrossCatModel] = {
    require(st.models.nonEmpty, "No models initialized")
    modelnos match {
      case None => st.models
      case Some(ns) => st.models.filter(m => ns.contains(m.modelno))
    }
  }

  private def initModel(st: CrossCatState, modelno: Int, rng: DetRng): CrossCatModel = {
    val d = st.colnos.length
    val n = st.data.head.length
    val alpha = rng.nextGamma(1.0, 1.0) max 1e-3
    // CRP draw over columns
    val viewOf = new Array[Int](d)
    var nViews = 0
    val viewCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (j <- 0 until d) {
      val weights = viewCounts.map(_.toDouble).toIndexedSeq :+ alpha
      val k = rng.logCategorical(weights.map(math.log))
      if (k == nViews) { viewCounts += 1; nViews += 1 } else viewCounts(k) += 1
      viewOf(j) = k
    }
    val viewAlpha = IndexedSeq.fill(nViews)(rng.nextGamma(1.0, 1.0) max 1e-3)
    val rowAssign = (0 until nViews).map(v => crpPartition(n, viewAlpha(v), rng))
    val hypers: IndexedSeq[ColHyper] = st.colnos.indices.map { j =>
      st.colTypes(j) match {
        case NumericalCol => NigH(defaultHypers(st.moments(j)))
        case CategoricalCol(_) => CatH(1.0)
      }
    }
    CrossCatModel(modelno, alpha, viewOf.toIndexedSeq, viewAlpha, rowAssign, hypers)
  }

  private def crpPartition(n: Int, alpha: Double, rng: DetRng): IndexedSeq[Int] = {
    val out = new Array[Int](n)
    val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until n) {
      val weights = counts.map(_.toDouble).toIndexedSeq :+ alpha
      val k = rng.logCategorical(weights.map(math.log))
      if (k == counts.length) counts += 1 else counts(k) += 1
      out(i) = k
    }
    out.toIndexedSeq
  }

  private def defaultHypers(mom: ColMoments): NigHypers =
    NigHypers(m = mom.mean, r = 1.0, s = mom.variance, nu = 1.0)

  /** One full Gibbs sweep: rows per view → column views → hypers →
    * concentrations (the reference's five subproblems). `restrict`
    * limits the column-targeted kernels to those colIdxs (rows sweep
    * only their views); `rowRestrict` limits the row kernel to those
    * subsample indices; `kernels` selects which of the five subproblems
    * run (reference conversion table cgpm_backend.py:1420-1464). */
  private def transition(st: CrossCatState, m0: CrossCatModel, rng: DetRng,
      restrict: Option[Set[Int]] = None,
      rowRestrict: Option[Set[Int]] = None,
      kernels: Option[Set[String]] = None): CrossCatModel = {
    def run(k: String) = kernels.forall(_.contains(k))
    var m = m0
    if (run("row_clustering")) m = transitionRows(st, m, rng, restrict, rowRestrict)
    if (run("variable_clustering")) m = transitionColumns(st, m, rng, restrict)
    if (run("variable_hyperparameters")) m = transitionHypers(st, m, rng, restrict)
    m = transitionAlphas(st, m, rng,
      viewCrp = run("variable_clustering_concentration"),
      rowCrp = run("row_clustering_concentration"))
    m
  }

  /** Per-view suff stats: per column in the view, per cluster — numeric
    * (n, Σx, Σx²) and categorical per-category counts. Memoized per
    * (modelno, view) on the immutable state. */
  private[backends] def workspace(st: CrossCatState, m: CrossCatModel, v: Int): ViewSuff =
    st.wsMemo.computeIfAbsent((m.modelno, v), _ => buildWorkspace(st, m, v))

  private def buildWorkspace(st: CrossCatState, m: CrossCatModel, v: Int): ViewSuff = {
    val cols = st.colnos.indices.filter(j => m.viewOf(j) == v).toIndexedSeq
    val assign = m.rowAssign(v)
    val k = if (assign.isEmpty) 0 else assign.max + 1
    val counts = new Array[Int](k)
    val suff = cols.map(j => ColSuff.empty(st.colTypes(j), k)).toArray
    for (i <- assign.indices) {
      val z = assign(i)
      counts(z) += 1
      for (jj <- cols.indices) {
        val x = st.data(cols(jj))(i)
        if (!x.isNaN) suff(jj).add(z, x)
      }
    }
    ViewSuff(cols, counts, suff)
  }

  /** Cluster log-weights (CRP prior × likelihood of the given in-view
    * (colIdx, value) evidence), including one fresh cluster at the end. */
  private[backends] def clusterLogWeights(st: CrossCatState, m: CrossCatModel, v: Int,
      w: ViewSuff, evidence: Seq[(Int, Double)]): IndexedSeq[Double] = {
    val k = w.counts.length
    val alpha = m.viewAlpha(v)
    (0 to k).map { z =>
      val prior = if (z < k) math.log(w.counts(z).toDouble) else math.log(alpha)
      val like = evidence.map { case (j, x) =>
        val jj = w.cols.indexOf(j)
        if (jj < 0) 0.0
        else if (z < k) w.suff(jj).predictive(z, x, m.hypers(j))
        else ColSuff.freshPredictive(st.colTypes(j), x, m.hypers(j))
      }.sum
      prior + like
    }
  }

  private def transitionRows(st: CrossCatState, m: CrossCatModel, rng: DetRng,
      restrict: Option[Set[Int]] = None,
      rowRestrict: Option[Set[Int]] = None): CrossCatModel = {
    val n = st.data.head.length
    val newAssign = m.rowAssign.zipWithIndex.map { case (assign0, v) =>
      val cols = st.colnos.indices.filter(j => m.viewOf(j) == v).toIndexedSeq
      if (restrict.exists(r => !cols.exists(r))) {
        // view holds no targeted variables: leave its partition alone
        assign0
      } else {
      val assign = assign0.toArray
      var k = if (assign.isEmpty) 0 else assign.max + 1
      val counts = scala.collection.mutable.ArrayBuffer.fill(k)(0)
      val suff = cols.map(j => ColSuff.growable(st.colTypes(j), k)).toArray
      for (i <- 0 until n) {
        val z = assign(i)
        counts(z) += 1
        for (jj <- cols.indices) {
          val x = st.data(cols(jj))(i)
          if (!x.isNaN) suff(jj).add(z, x)
        }
      }
      val alpha = m.viewAlpha(v)
      for (i <- 0 until n if rowRestrict.forall(_.contains(i))) {
        // remove row i
        val zi = assign(i)
        counts(zi) -= 1
        for (jj <- cols.indices) {
          val x = st.data(cols(jj))(i)
          if (!x.isNaN) suff(jj).remove(zi, x)
        }
        val logw = (0 to counts.length).map { z =>
          if (z < counts.length && counts(z) == 0) Double.NegativeInfinity
          else {
            val prior =
              if (z < counts.length) math.log(counts(z).toDouble)
              else math.log(alpha)
            val like = cols.indices.map { jj =>
              val x = st.data(cols(jj))(i)
              if (x.isNaN) 0.0
              else if (z < counts.length) suff(jj).predictive(z, x, m.hypers(cols(jj)))
              else ColSuff.freshPredictive(st.colTypes(cols(jj)), x, m.hypers(cols(jj)))
            }.sum
            prior + like
          }
        }
        val zNew = rng.logCategorical(logw.toIndexedSeq)
        if (zNew == counts.length) { counts += 0; suff.foreach(_.grow()) }
        counts(zNew) += 1
        for (jj <- cols.indices) {
          val x = st.data(cols(jj))(i)
          if (!x.isNaN) suff(jj).add(zNew, x)
        }
        assign(i) = zNew
      }
      // compact empty clusters
      val live = counts.zipWithIndex.filter(_._1 > 0).map(_._2)
      val remap = live.zipWithIndex.toMap
      assign.map(remap).toIndexedSeq
      }
    }
    m.copy(rowAssign = newAssign)
  }

  private def transitionColumns(st: CrossCatState, m0: CrossCatModel, rng: DetRng,
      restrict: Option[Set[Int]] = None): CrossCatModel = {
    var m = m0
    val n = st.data.head.length
    for (j <- st.colnos.indices if restrict.forall(_.contains(j))) {
      val vOld = m.viewOf(j)
      // column marginal under each view's row partition
      def colMarginal(assign: IndexedSeq[Int]): Double = {
        val k = if (assign.isEmpty) 0 else assign.max + 1
        val s = ColSuff.empty(st.colTypes(j), k)
        for (i <- 0 until n) {
          val x = st.data(j)(i)
          if (!x.isNaN) s.add(assign(i), x)
        }
        (0 until k).map(z => s.marginal(z, m.hypers(j))).sum
      }
      val nViews = m.rowAssign.length
      // auxiliary view (Neal algorithm 8, m=1): when the column's
      // CURRENT view is a singleton, that view — with its learned row
      // partition — IS the auxiliary component (a fresh prior draw in
      // its place breaks detailed balance and biases the chain toward
      // whatever the prior draws fit, observed as spurious column
      // independence on small data); only a non-singleton departure
      // proposes a fresh CRP partition.
      val isSingleton =
        st.colnos.indices.count(jj => m.viewOf(jj) == vOld) == 1
      val auxAlpha = rng.nextGamma(1.0, 1.0) max 1e-3
      val auxAssign = crpPartition(n, auxAlpha, rng)
      val logw = (0 until nViews).map { v =>
        val size = st.colnos.indices.count(jj => m.viewOf(jj) == v) -
          (if (v == vOld) 1 else 0)
        if (size == 0) {
          if (v == vOld && isSingleton)
            math.log(m.alpha) + colMarginal(m.rowAssign(v))
          else Double.NegativeInfinity
        } else math.log(size.toDouble) + colMarginal(m.rowAssign(v))
      } :+ (if (isSingleton) Double.NegativeInfinity
            else math.log(m.alpha) + colMarginal(auxAssign))
      val pick = rng.logCategorical(logw)
      if (pick != vOld) {
        val viewOf = m.viewOf.updated(j, if (pick < nViews) pick else nViews)
        var rowAssign = m.rowAssign
        var viewAlpha = m.viewAlpha
        if (pick == nViews) { rowAssign = rowAssign :+ auxAssign; viewAlpha = viewAlpha :+ auxAlpha }
        val liveViews = rowAssign.indices.filter(v => viewOf.contains(v))
        val remap = liveViews.zipWithIndex.toMap
        m = m.copy(
          viewOf = viewOf.map(remap),
          viewAlpha = liveViews.map(viewAlpha),
          rowAssign = liveViews.map(rowAssign))
      }
    }
    m
  }

  private def transitionHypers(st: CrossCatState, m: CrossCatModel, rng: DetRng,
      restrict: Option[Set[Int]] = None): CrossCatModel = {
    val n = st.data.head.length
    val hypers: IndexedSeq[ColHyper] = st.colnos.indices.map { j =>
      if (restrict.exists(r => !r.contains(j))) m.hypers(j) else {
      val v = m.viewOf(j)
      val assign = m.rowAssign(v)
      val k = if (assign.isEmpty) 0 else assign.max + 1
      val s = ColSuff.empty(st.colTypes(j), k)
      for (i <- assign.indices) {
        val x = st.data(j)(i)
        if (!x.isNaN) s.add(assign(i), x)
      }
      m.hypers(j) match {
        case NigH(h0) =>
          def score(h: NigHypers): Double =
            (0 until k).map(z => s.marginal(z, NigH(h))).sum
          val mom = st.moments(j)
          var h = h0
          val mGrid = linGrid(mom.min, mom.max, gridSize)
          h = h.copy(m = gridPick(mGrid, (x: Double) => score(h.copy(m = x)), rng))
          val rGrid = logGrid(1.0 / n, 10.0, gridSize)
          h = h.copy(r = gridPick(rGrid, (x: Double) => score(h.copy(r = x)), rng))
          val sGrid = logGrid(mom.variance / 100.0 + 1e-9, mom.variance * 100.0 + 1e-6, gridSize)
          h = h.copy(s = gridPick(sGrid, (x: Double) => score(h.copy(s = x)), rng))
          val nuGrid = logGrid(0.5, n.toDouble max 2.0, gridSize)
          h = h.copy(nu = gridPick(nuGrid, (x: Double) => score(h.copy(nu = x)), rng))
          NigH(h)
        case CatH(_) =>
          val grid = logGrid(1.0 / math.max(n, 2), n.toDouble max 2.0, gridSize)
          CatH(gridPick(grid, (a: Double) =>
            (0 until k).map(z => s.marginal(z, CatH(a))).sum, rng))
      }
      }
    }
    m.copy(hypers = hypers)
  }

  private def transitionAlphas(st: CrossCatState, m: CrossCatModel, rng: DetRng,
      viewCrp: Boolean = true, rowCrp: Boolean = true): CrossCatModel = {
    val d = st.colnos.length
    val nViews = m.rowAssign.length
    val viewSizes = (0 until nViews).map(v => st.colnos.indices.count(j => m.viewOf(j) == v))
    val aGrid = logGrid(1.0 / d, d.toDouble, gridSize)
    val alpha =
      if (viewCrp) gridPick(aGrid, (a: Double) => crpLogpdf(viewSizes, d, a), rng)
      else m.alpha
    val viewAlpha =
      if (!rowCrp) m.viewAlpha
      else (0 until nViews).map { v =>
        val assign = m.rowAssign(v)
        val k = if (assign.isEmpty) 0 else assign.max + 1
        val sizes = (0 until k).map(z => assign.count(_ == z))
        val n = assign.length
        val g = logGrid(1.0 / math.max(n, 2), n.toDouble max 2.0, gridSize)
        gridPick(g, (a: Double) => crpLogpdf(sizes, n, a), rng)
      }
    m.copy(alpha = alpha, viewAlpha = viewAlpha)
  }

  // --------------------------------------------------- query primitives

  /** log p(targets | constraints, model): per view, cluster weights are
    * CRP prior × constraint likelihood; targets integrate over clusters. */
  private[backends] def modelLogpdf(st: CrossCatState, m: CrossCatModel,
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double = {
    val tByView = targets.groupBy { case (c, _) => m.viewOf(st.colIdx(c)) }
    val cByView = constraints.groupBy { case (c, _) => m.viewOf(st.colIdx(c)) }
    tByView.map { case (v, ts) =>
      val w = workspace(st, m, v)
      val cs = cByView.getOrElse(v, Nil).map { case (c, x) => (st.colIdx(c), x) }
      val logwC = clusterLogWeights(st, m, v, w, cs)
      val norm = logSumExp(logwC.toArray)
      val k = w.counts.length
      val terms = (0 to k).map { z =>
        val tLike = ts.map { case (c, x) =>
          val j = st.colIdx(c)
          val jj = w.cols.indexOf(j)
          if (z < k) w.suff(jj).predictive(z, x, m.hypers(j))
          else ColSuff.freshPredictive(st.colTypes(j), x, m.hypers(j))
        }.sum
        (logwC(z) - norm) + tLike
      }
      logSumExp(terms.toArray)
    }.sum
  }

  private[backends] def simulateOne(st: CrossCatState, m: CrossCatModel,
      targets: Seq[Int], constraints: Seq[(Int, Double)], rng: DetRng): Seq[Double] = {
    val byView = targets.groupBy(c => m.viewOf(st.colIdx(c)))
    val cByView = constraints.groupBy { case (c, _) => m.viewOf(st.colIdx(c)) }
    val drawn = byView.flatMap { case (v, ts) =>
      val w = workspace(st, m, v)
      val cs = cByView.getOrElse(v, Nil).map { case (c, x) => (st.colIdx(c), x) }
      val logw = clusterLogWeights(st, m, v, w, cs)
      val z = rng.logCategorical(logw)
      val k = w.counts.length
      ts.map { c =>
        val j = st.colIdx(c)
        val jj = w.cols.indexOf(j)
        c -> (if (z < k) w.suff(jj).sample(z, m.hypers(j), rng)
              else ColSuff.freshSample(st.colTypes(j), m.hypers(j), rng))
      }
    }
    targets.map(drawn)
  }

  // --------------------------------------- foreign-composition network
  // (reference: the cgpm network modules route queries touching composed
  //  CGPMs through importance-weighted forward sampling; the public
  //  algorithm — likelihood weighting on a DAG whose root is the
  //  baseline CrossCat — is re-implemented here from that description.)

  /** Importance-sampling width for network queries. */
  private val networkSamples = 16

  /** Proposal width under `SIMULATE ... ACCURACY n`: n× the base width
    * (n proposals per base slot), bounded to keep a user-supplied
    * ACCURACY 10^9 from freezing the driver. */
  private def networkWidth(accuracy: Option[Int]): Int =
    networkSamples * math.min(math.max(accuracy.getOrElse(1), 1), 4096)

  /** The foreign nodes whose outputs we must realize to produce `need`,
    * plus everything they transitively depend on. */
  private def involvedSpecs(st: CrossCatState, need: Set[Int]): IndexedSeq[ForeignSpec] = {
    val want = scala.collection.mutable.Set.empty[ForeignSpec]
    var grow = need
    var changed = true
    while (changed) {
      changed = false
      st.foreignSpecs.foreach { f =>
        if (!want(f) && f.outputs.exists(grow)) {
          want += f; grow = grow ++ f.inputs; changed = true
        }
      }
    }
    st.foreignSpecs.filter(want)  // keep topo order
  }

  /** One forward pass: realize every colno in `need` (baseline draws via
    * the view sampler, foreign outputs via their predictors in topo
    * order), honoring `fixed` as evidence. `eval` lists node outputs to
    * score instead of draw — their joint log-density given the realized
    * inputs accumulates into the returned weight, and their fixed values
    * feed nodes downstream. Returns (assignment, logWeight). */
  private def networkForward(st: CrossCatState, m: CrossCatModel,
      need: Set[Int], fixed: Map[Int, Double],
      eval: Map[ForeignSpec, Seq[(Int, Double)]],
      rng: DetRng): (Map[Int, Double], Double) = {
    val nodes = involvedSpecs(st, need ++ eval.keys.flatMap(_.outputs))
    val needBase = (need ++ nodes.flatMap(_.inputs))
      .filterNot(st.foreignCols).filterNot(fixed.contains)
    val baseConstraints = fixed.toSeq.filterNot { case (c, _) => st.foreignCols(c) }
    val baseDraw =
      if (needBase.isEmpty) Map.empty[Int, Double]
      else needBase.toSeq.zip(
        simulateOne(st, m, needBase.toSeq, baseConstraints, rng)).toMap
    var acc: Map[Int, Double] = fixed ++ baseDraw
    var logw = 0.0
    nodes.foreach { f =>
      val inputs = f.inputs.map(c => c -> acc.getOrElse(c,
        throw new IllegalStateException(s"network input $c unrealized")))
      val scored = eval.getOrElse(f, Nil)
      val fixedOwn = f.outputs.flatMap(c => acc.get(c).map(c -> _))
        .filterNot { case (c, _) => scored.exists(_._1 == c) }
      val toDraw = f.outputs.filterNot(c =>
        acc.contains(c) || scored.exists(_._1 == c))
      val predictor = m.foreign(st.foreignSpecs.indexOf(f))
      if (scored.nonEmpty) {
        // joint density of the scored outputs given inputs and any
        // upstream-fixed own outputs
        logw += predictor.logpdf(scored, inputs ++ fixedOwn)
        acc = acc ++ scored.map { case (c, v) => c -> v }
      }
      if (toDraw.nonEmpty) {
        val drawn = predictor.simulate(toDraw, inputs ++ fixedOwn ++ scored, rng)
        acc = acc ++ toDraw.zip(drawn)
      }
    }
    (acc, logw)
  }

  /** Draw `targets` given `constraints` across the composed network.
    * Constraints on foreign outputs are handled by likelihood weighting:
    * forward samples are weighted by the constrained outputs' densities
    * and one is resampled in proportion. */
  private[backends] def networkSimulate(st: CrossCatState, m: CrossCatModel,
      targets: Seq[Int], constraints: Seq[(Int, Double)], rng: DetRng,
      accuracy: Option[Int] = None): Seq[Double] = {
    val (cFor, cBase) = constraints.partition { case (c, _) => st.foreignCols(c) }
    if (cFor.isEmpty) {
      // pure forward draw (no foreign constraint to weight by) — exact
      // ancestral sampling, accuracy spends nothing here
      val (acc, _) = networkForward(st, m, targets.toSet, cBase.toMap, Map.empty, rng)
      targets.map(acc)
    } else {
      val evalByNode: Map[ForeignSpec, Seq[(Int, Double)]] =
        cFor.groupBy { case (c, _) =>
          st.foreignSpecs.find(_.outputs.contains(c)).getOrElse(
            throw new IllegalArgumentException(s"No foreign node produces colno $c"))
        }
      val fixed = cBase.toMap
      val draws = (0 until networkWidth(accuracy)).map { _ =>
        networkForward(st, m, targets.toSet, fixed, evalByNode, rng)
      }
      val pick = rng.logCategorical(draws.map(_._2).toIndexedSeq)
      targets.map(draws(pick)._1)
    }
  }

  /** log p(targets | constraints) across the network by likelihood
    * weighting: numerator conditions on the baseline targets and scores
    * foreign targets+constraints; denominator scores the foreign
    * constraints alone. */
  private[backends] def networkLogpdf(st: CrossCatState, m: CrossCatModel,
      targets: Seq[(Int, Double)], constraints: Seq[(Int, Double)]): Double = {
    val rng = DetRng(m.modelno.toLong, 0x4e7109fdL,
      (targets ++ constraints).hashCode.toLong)
    val (tFor, tBase) = targets.partition { case (c, _) => st.foreignCols(c) }
    val (cFor, cBase) = constraints.partition { case (c, _) => st.foreignCols(c) }
    def nodeOf(c: Int): ForeignSpec =
      st.foreignSpecs.find(_.outputs.contains(c)).getOrElse(
        throw new IllegalArgumentException(s"No foreign node produces colno $c"))
    val logBase =
      if (tBase.isEmpty) 0.0 else modelLogpdf(st, m, tBase, cBase)
    val numEval: Map[ForeignSpec, Seq[(Int, Double)]] =
      (tFor ++ cFor).groupBy { case (c, _) => nodeOf(c) }
    val logNum =
      if (tFor.isEmpty && cFor.isEmpty) 0.0
      else logMeanExp((0 until networkSamples).map { _ =>
        networkForward(st, m, Set.empty,
          (cBase ++ tBase).toMap, numEval, rng)._2
      }.toArray)
    val logDen =
      if (cFor.isEmpty) 0.0
      else {
        val denEval = cFor.groupBy { case (c, _) => nodeOf(c) }
        logMeanExp((0 until networkSamples).map { _ =>
          networkForward(st, m, Set.empty, cBase.toMap, denEval, rng)._2
        }.toArray)
      }
    logBase + logNum - logDen
  }

  /** Network dependence: outputs of one node are mutually dependent and
    * inherit dependence through their inputs (reference: cgpm extends
    * dependence over the composition DAG via ancestor sets). */
  private def networkDependent(st: CrossCatState, m: CrossCatModel,
      a: Int, b: Int): Boolean = {
    if (a == b) return true
    val fa = st.foreignSpecs.find(_.outputs.contains(a))
    val fb = st.foreignSpecs.find(_.outputs.contains(b))
    (fa, fb) match {
      case (None, None) =>
        m.viewOf(st.colIdx(a)) == m.viewOf(st.colIdx(b))
      case (Some(f), Some(g)) if f == g => true
      case (Some(f), _) => f.inputs.exists(i => networkDependent(st, m, i, b))
      case (None, Some(g)) => g.inputs.exists(i => networkDependent(st, m, a, i))
    }
  }
}

object CrossCatBackend {
  /** Fixed salt for the uniform MCMC subsample: the sampled rowid SET is a
    * pure function of (rowid values, this seed) — stable across retries,
    * re-partitioning, and input reordering. */
  val SubsampleSeed: Long = 0x5ca1ab1e5eedL
}

/** CrossCat state containers + conjugate component math (NIG-Normal and
  * symmetric-Dirichlet categorical). */
object CrossCat {

  final case class ColMoments(mean: Double, variance: Double, min: Double, max: Double)

  sealed trait ColType extends Serializable
  case object NumericalCol extends ColType
  final case class CategoricalCol(k: Int) extends ColType

  final case class NigHypers(m: Double, r: Double, s: Double, nu: Double)

  sealed trait ColHyper extends Serializable
  final case class NigH(h: NigHypers) extends ColHyper
  final case class CatH(alpha: Double) extends ColHyper

  final case class CrossCatModel(
      modelno: Int,
      alpha: Double,
      viewOf: IndexedSeq[Int],
      viewAlpha: IndexedSeq[Double],
      rowAssign: IndexedSeq[IndexedSeq[Int]],
      hypers: IndexedSeq[ColHyper],
      foreign: IndexedSeq[ForeignCgpm.ForeignPredictor] = IndexedSeq.empty)
    extends ModelState

  final case class CrossCatState(
      columns: Map[Int, String],
      colnos: IndexedSeq[Int],
      colTypes: IndexedSeq[ColType],
      cats: Map[Int, IndexedSeq[String]],
      data: Array[Array[Double]],     // column-major subsample, NaN = missing
      rowids: Array[Long],
      moments: IndexedSeq[ColMoments],
      models: IndexedSeq[CrossCatModel],
      foreignSpecs: IndexedSeq[ForeignCgpm.ForeignSpec] = IndexedSeq.empty,
      foreignData: Map[Int, Array[Double]] = Map.empty) extends GeneratorState {

    /** colnos produced by foreign predictors (manifest + latent). */
    @transient lazy val foreignCols: Set[Int] = foreignSpecs.flatMap(_.outputs).toSet
    override def modelNumbers: Seq[Int] = models.map(_.modelno)
    override def categoryCodes: Map[Int, IndexedSeq[String]] = cats
    def colIdx(colno: Int): Int = {
      val j = colnos.indexOf(colno)
      require(j >= 0,
        if (foreignCols(colno))
          s"colno $colno is a foreign/latent output — row-structure " +
            "estimators (SIMILARITY / PREDICTIVE RELEVANCE context) need a " +
            "baseline CrossCat variable"
        else s"Unknown colno: $colno")
      j
    }
    /** rowid → subsample index; O(1) — the SIMILARITY / PREDICTIVE
      * RELEVANCE UDF paths call this per row of a pairwise join.
      * (@transient lazy: rebuilt once per executor after broadcast.) */
    @transient private lazy val rowIndex: Map[Long, Int] =
      rowids.iterator.zipWithIndex.toMap
    def rowIdx(rowid: Long): Int = rowIndex.getOrElse(rowid, -1)

    /** Per-(modelno, view) suff-stat workspace memo: the query-path
      * estimators (PREDICTIVE RELEVANCE hypotheticals, densities) rebuild
      * identical O(subsample × cols) workspaces per evaluated row
      * otherwise. Transient: dropped on serialization, rebuilt lazily on
      * each executor; the state itself is immutable so entries never
      * go stale (any model move produces a new CrossCatState). */
    @transient lazy val wsMemo =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int), ViewSuff]()
  }

  /** Mutable per-column suff stats over clusters: numeric (n, Σx, Σx²) or
    * per-category counts. */
  final class ColSuff(val tpe: ColType,
      var n: Array[Double], var sum: Array[Double], var ssq: Array[Double],
      var cat: Array[Array[Double]]) extends Serializable {
    def add(z: Int, x: Double): Unit = tpe match {
      case NumericalCol => n(z) += 1; sum(z) += x; ssq(z) += x * x
      case CategoricalCol(_) => n(z) += 1; cat(z)(x.toInt) += 1
    }
    def remove(z: Int, x: Double): Unit = tpe match {
      case NumericalCol => n(z) -= 1; sum(z) -= x; ssq(z) -= x * x
      case CategoricalCol(_) => n(z) -= 1; cat(z)(x.toInt) -= 1
    }
    def grow(): Unit = {
      n = n :+ 0.0; sum = sum :+ 0.0; ssq = ssq :+ 0.0
      tpe match {
        case CategoricalCol(k) => cat = cat :+ new Array[Double](k)
        case _ => ()
      }
    }
    def predictive(z: Int, x: Double, h: ColHyper): Double = (tpe, h) match {
      case (NumericalCol, NigH(hh)) => predictiveLogp(x, n(z), sum(z), ssq(z), hh)
      case (CategoricalCol(k), CatH(a)) =>
        // out-of-support category code: density 0 (cgpm: an unseen
        // categorical value has log-probability −∞, not an error)
        if (x < 0 || x >= k || x != math.floor(x)) Double.NegativeInfinity
        else math.log((cat(z)(x.toInt) + a) / (n(z) + k * a))
      case _ => throw new IllegalStateException("suff/hyper type mismatch")
    }
    def marginal(z: Int, h: ColHyper): Double = (tpe, h) match {
      case (NumericalCol, NigH(hh)) => marginalLogp(n(z), sum(z), ssq(z), hh)
      case (CategoricalCol(k), CatH(a)) =>
        // Dirichlet-multinomial marginal
        if (n(z) == 0) 0.0
        else lgamma(k * a) - lgamma(k * a + n(z)) +
          cat(z).map(c => lgamma(a + c) - lgamma(a)).sum
      case _ => throw new IllegalStateException("suff/hyper type mismatch")
    }
    def sample(z: Int, h: ColHyper, rng: DetRng): Double = (tpe, h) match {
      case (NumericalCol, NigH(hh)) => samplePredictive(n(z), sum(z), ssq(z), hh, rng)
      case (CategoricalCol(k), CatH(a)) =>
        val w = (0 until k).map(c => math.log(cat(z)(c) + a))
        rng.logCategorical(w).toDouble
      case _ => throw new IllegalStateException("suff/hyper type mismatch")
    }
  }

  object ColSuff {
    def empty(tpe: ColType, k: Int): ColSuff = tpe match {
      case NumericalCol =>
        new ColSuff(tpe, new Array[Double](k), new Array[Double](k), new Array[Double](k), Array.empty)
      case CategoricalCol(kk) =>
        new ColSuff(tpe, new Array[Double](k), Array.empty, Array.empty,
          Array.fill(k)(new Array[Double](kk)))
    }
    def growable(tpe: ColType, k: Int): ColSuff = empty(tpe, k)
    def freshPredictive(tpe: ColType, x: Double, h: ColHyper): Double = (tpe, h) match {
      case (NumericalCol, NigH(hh)) => predictiveLogp(x, 0.0, 0.0, 0.0, hh)
      case (CategoricalCol(k), CatH(a)) =>
        if (x < 0 || x >= k || x != math.floor(x)) Double.NegativeInfinity
        else math.log(1.0 / k)
      case _ => throw new IllegalStateException("suff/hyper type mismatch")
    }
    def freshSample(tpe: ColType, h: ColHyper, rng: DetRng): Double = (tpe, h) match {
      case (NumericalCol, NigH(hh)) => samplePredictive(0.0, 0.0, 0.0, hh, rng)
      case (CategoricalCol(k), CatH(_)) => rng.nextInt(k).toDouble
      case _ => throw new IllegalStateException("suff/hyper type mismatch")
    }
  }

  final case class ViewSuff(
      cols: IndexedSeq[Int],
      counts: Array[Int],
      suff: Array[ColSuff])

  private val HalfLog2Pi = 0.5 * math.log(2 * math.Pi)
  private val Log2 = math.log(2.0)

  /** Posterior NIG hypers given suff stats (standard conjugacy; same
    * update the reference's nig_normal port uses). */
  def posteriorHypers(n: Double, sumX: Double, sumXsq: Double,
      h: NigHypers): NigHypers = {
    val rn = h.r + n
    val nun = h.nu + n
    val mn = (h.r * h.m + sumX) / rn
    val sn0 = h.s + sumXsq + h.r * h.m * h.m - rn * mn * mn
    val sn = if (sn0 <= 0) h.s else sn0
    NigHypers(mn, rn, sn, nun)
  }

  def logZ(r: Double, s: Double, nu: Double): Double =
    ((nu + 1.0) / 2.0) * Log2 + HalfLog2Pi - 0.5 * math.log(r) -
      (nu / 2.0) * math.log(s) + lgamma(nu / 2.0)

  /** Posterior predictive log-density of x given cluster suff stats. */
  def predictiveLogp(x: Double, n: Double, sumX: Double, sumXsq: Double,
      h: NigHypers): Double = {
    val hn = posteriorHypers(n, sumX, sumXsq, h)
    val hm = posteriorHypers(n + 1, sumX + x, sumXsq + x * x, h)
    -HalfLog2Pi + logZ(hm.r, hm.s, hm.nu) - logZ(hn.r, hn.s, hn.nu)
  }

  /** Marginal log-likelihood of a cluster's data. */
  def marginalLogp(n: Double, sumX: Double, sumXsq: Double, h: NigHypers): Double = {
    if (n == 0) return 0.0
    val hn = posteriorHypers(n, sumX, sumXsq, h)
    -(n / 2.0) * (2.0 * HalfLog2Pi) + logZ(hn.r, hn.s, hn.nu) - logZ(h.r, h.s, h.nu)
  }

  /** Sample from the cluster's posterior predictive: draw (μ, ρ) from the
    * posterior NIG, then x ~ N(μ, 1/ρ). */
  def samplePredictive(n: Double, sumX: Double, sumXsq: Double,
      h: NigHypers, rng: DetRng): Double = {
    val hn = posteriorHypers(n, sumX, sumXsq, h)
    val rho = rng.nextGamma(hn.nu / 2.0, 2.0 / hn.s)
    val mu = rng.gauss(hn.m, 1.0 / math.sqrt(rho * hn.r))
    rng.gauss(mu, 1.0 / math.sqrt(rho))
  }

  /** CRP log-probability of a partition with the given block sizes. */
  def crpLogpdf(sizes: Seq[Int], n: Int, alpha: Double): Double = {
    val k = sizes.count(_ > 0)
    k * math.log(alpha) + lgamma(alpha) - lgamma(alpha + n) +
      sizes.filter(_ > 0).map(sz => lgamma(sz.toDouble)).sum
  }

  def linGrid(lo: Double, hi: Double, k: Int): IndexedSeq[Double] = {
    val l = if (hi > lo) lo else lo - 0.5
    val h = if (hi > lo) hi else lo + 0.5
    (0 until k).map(i => l + (h - l) * i / (k - 1).toDouble)
  }

  def logGrid(lo: Double, hi: Double, k: Int): IndexedSeq[Double] = {
    val l = math.log(math.max(lo, 1e-12))
    val h = math.log(math.max(hi, lo * 10))
    (0 until k).map(i => math.exp(l + (h - l) * i / (k - 1).toDouble))
  }

  def gridPick(grid: IndexedSeq[Double], score: Double => Double, rng: DetRng): Double =
    grid(rng.logCategorical(grid.map(score)))
}
