package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-counting sketches for corpus analytics at 100 TB —
  * operations where the EXACT answer forces an exchange proportional to
  * the number of distinct values (every distinct URL, every distinct
  * n-gram), but the sketch's exchange is bounded by the register file.
  *
  * Everything here is deterministic in the input (the hash is the
  * corpus-standard FNV-1a+splitmix chain), so unlike typical sketch
  * libraries the OUTPUT is oracle-gateable: DuckDB reproduces every
  * register and therefore every estimate bit-for-bit (p76). Reference
  * has no sketch surface; pipeline extension.
  */
object Sketches {

  /** Per-group HyperLogLog register file: one row per (group, register)
    * carrying the max leading-one rank observed. This IS the sketch —
    * 2^p rows per group at most, mergeable by `max` (see
    * [[hllMergeRegisters]]), estimable by [[hllEstimate]].
    *
    * Scale shape: the observation pass is row-local codegen
    * ([[graft.functions.HllRegRho]]); the aggregate is map-side
    * combined, so the exchange carries at most (groups × 2^p) partial
    * rows per mapper — never a distinct-key stream. At 100 TB this
    * replaces the COUNT(DISTINCT url)-per-domain shuffle whose exchange
    * is the distinct-URL set itself. */
  def hllRegisters(df: DataFrame, grpCol: String, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"HLL precision must be in [4, 16], got $p")
    val pk = graft.functions.HllRegRho(col(keyCol), p)
    df.select(col(grpCol), pk.as("pk"))
      .filter(col("pk").isNotNull)
      .groupBy(col(grpCol), shiftright(col("pk"), 8).as("reg"))
      .agg(max(col("pk").bitwiseAND(lit(255))).as("mrho"))
  }

  /** Merge a register file down to a single rollup group — the HLL
    * merge property (register-wise max), i.e. the union sketch. The
    * input is already register-bounded, so this exchange carries at
    * most 2^p rows per mapper. */
  def hllMergeRegisters(regs: DataFrame, grpCol: String, rollupName: String): DataFrame =
    regs.groupBy(col("reg")).agg(max(col("mrho")).as("mrho"))
      .select(lit(rollupName).as(grpCol), col("reg"), col("mrho"))

  /** One Count–Min cell index: hash row `r`'s cell for a token —
    * mix(xx(token) XOR r) folded to 63 bits (the hash63 shift, so the
    * signed mod equals the oracle's unsigned one) mod `w`. */
  private def cmsCell(z: Column, r: Int, w: Int): Column =
    pmod(shiftrightunsigned(
      graft.functions.Mix64(z.bitwiseXOR(lit(r.toLong))), 1), lit(w.toLong))

  /** Count–Min sketch build (Cormode & Muthukrishnan 2005): d×w
    * counters over a token stream — the bounded-memory frequency
    * structure under heavy-hitter detection. Each occurrence increments
    * one cell per hash row; a point query reads the MIN over its d
    * cells, which can only OVERestimate (by ≤ εN with ε = e/w, the
    * classic bound).
    *
    * Scale shape (100 TB): the build is ONE map-side-combined
    * aggregate whose exchange is bounded by d×w partial cells per
    * mapper — never the distinct-token stream (the p76 register
    * argument, for frequencies instead of cardinalities). Counters are
    * EXACT sums, so the whole sketch — including every collision — is
    * reproduced bit-identically by the DuckDB oracle (p79). Returns
    * (r, cell, n). */
  def cmsBuild(toks: DataFrame, tokCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"CMS depth must be in [1, 8], got $d")
    require(w > 0, s"CMS width must be positive, got $w")
    val withZ = toks.select(graft.functions.Xx64(col(tokCol)).as("__z"))
      .filter(col("__z").isNotNull)
    withZ.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsCell(col("__z"), r, w).as("cell"))): _*))
        .as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point queries against a built sketch: min over the d cells, 0 for
    * a token whose cells were never touched. The cell table is d×w
    * rows, so the join broadcasts — the probe side never shuffles. */
  def cmsEstimate(cells: DataFrame, queries: DataFrame, tokCol: String,
      d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8, s"CMS depth must be in [1, 8], got $d")
    require(w > 0, s"CMS width must be positive, got $w")
    val z = graft.functions.Xx64(col(tokCol))
    queries.select(col(tokCol), z.as("__z"))
      .select(col(tokCol), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cmsCell(col("__z"), r, w).as("cell"))): _*))
        .as("rc"))
      .join(broadcast(cells),
        col("rc.r") === cells("r") && col("rc.cell") === cells("cell"),
        "left")
      .groupBy(col(tokCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cm_estimate"))
  }

  /** Deterministic sample-based quantile estimation — the RANK member
    * of the sketch family (HLL = distinct count, CMS = frequency,
    * this = quantiles): per group, the estimator is the discrete
    * quantile of a seeded-hash uniform sample of expected size `k`,
    * so the group aggregate's exchange carries ≈ k values per group
    * instead of the corpus, and the whole estimate is a pure function
    * of (ids, seed) — rerun-, retry-, and repartition-stable, and
    * exactly restatable by an independent SQL engine. (KLL/t-digest
    * give tighter guarantees per byte, but their compaction depends
    * on merge order, which a shuffle does not fix — a non-starter for
    * the oracle discipline and for bit-stable retries.)
    *
    * Sampling rule: a row enters the sample iff n ≤ k (small group —
    * the estimate is exact) or hash63(id, seed) < floor(k/n · 2⁶³)
    * (the weightedMix threshold discipline: one double rounding,
    * identical IEEE-754 on every engine). Quantile rule: sorted
    * sample v[0..m), q ↦ v[min(m−1, floor(q·m))] — the discrete
    * lower quantile. Rank error is O(n/√k) whp (binomial tail); k
    * trades accuracy for exchange width.
    *
    * Scale shape: ONE map-combined count per group (broadcast back —
    * group-cardinality-bounded), a row-local threshold filter, then
    * one group aggregate whose collect_list is ≈ k values (the only
    * per-group state; sorted row-locally after the combine). A group
    * whose sample is empty (possible only when n ≫ k, with
    * probability (1−k/n)ⁿ ≈ e⁻ᵏ) has no output row on either engine.
    *
    * Returns one row per (group, quantile label): (grpCol, n_rows,
    * n_sampled, quantile, est). */
  def sampleQuantiles(df: DataFrame, grpCol: String, idCol: String,
      valCol: String, k: Int, seed: Long,
      qs: Seq[(String, Double)]): DataFrame = {
    require(k > 0, "k must be positive")
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q < 1.0 },
      "quantiles must lie in [0, 1)")
    // a NULL id would silently fall out of the threshold branch (NULL
    // hash compares to nothing) while still counting toward n, and a
    // NULL value would vanish from collect_list while count() still
    // counts it — misaligning every rank index. Both fail loudly
    // instead, the semDedup broken-upstream discipline.
    val guarded = df
      .withColumn("__sqid",
        when(col(idCol).isNotNull, col(idCol).cast("long"))
          .otherwise(raise_error(lit(
            s"graft sampleQuantiles: NULL $idCol — broken upstream corpus?"))
            .cast("long")))
      .withColumn("__sqv",
        when(col(valCol).isNotNull, col(valCol))
          .otherwise(raise_error(lit(
            s"graft sampleQuantiles: NULL $valCol — a quantile over NULL is meaningless"))
            .cast(df.schema(valCol).dataType)))
    val counts = guarded.groupBy(grpCol).agg(count(lit(1)).as("__n"))
    val withN = guarded.join(broadcast(counts), Seq(grpCol))
    // the small-group branch guards the threshold arithmetic: k/n > 1
    // would push floor(k/n · 2⁶³) past Long.MaxValue and ANSI-throw
    val thresh = when(col("__n") <= k, lit(0L))
      .otherwise(floor(lit(k.toDouble) / col("__n") * lit(math.pow(2, 63)))
        .cast("long"))
    // the guarded hash is the LEFT disjunct so codegen's short-circuit
    // cannot skip the NULL-id raise on the small-group (n <= k) branch
    val sampled = withN.filter(
      Sampling.hash63(col("__sqid"), seed) < thresh || col("__n") <= k)
    val agg = sampled.groupBy(grpCol).agg(
      first(col("__n")).as("n_rows"),
      count(lit(1)).as("n_sampled"),
      sort_array(collect_list(col("__sqv"))).as("__vs"))
    agg.select(col(grpCol), col("n_rows"), col("n_sampled"), col("__vs"),
        explode(typedLit(qs)).as("__qq"))
      .withColumn("quantile", col("__qq._1"))
      .withColumn("__q", col("__qq._2"))
      .withColumn("est", element_at(col("__vs"),
        least(col("n_sampled") - 1,
          floor(col("__q") * col("n_sampled")).cast("long")).cast("int") + 1))
      .select(grpCol, "n_rows", "n_sampled", "quantile", "est")
  }

  /** Cardinality estimate from a register file: the Flajolet et al.
    * raw estimator alpha_m * m^2 / sum(2^-M_j) with the standard
    * small-range linear-counting correction (est = m * ln(m / V) when
    * raw <= 2.5m and V = empty registers > 0). No large-range
    * correction is needed with a 64-bit hash.
    *
    * The harmonic sum is computed in EXACT integer arithmetic —
    * sum(2^(61-M_j)) as DECIMAL(38,0), absent registers contributing
    * 2^61 — with ONE double rounding at the final cast, so the
    * estimate is reproducible across engines regardless of register
    * visit order (a naive sum(pow(2.0,-M_j)) is order-sensitive once
    * exponents spread past the 52-bit mantissa). Returns one row per
    * group: (grp, m, v_zero, raw_estimate, estimate), estimates
    * unrounded. */
  def hllEstimate(regs: DataFrame, grpCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"HLL precision must be in [4, 16], got $p")
    val m = 1 << p
    // Standard bias constants (Flajolet et al. §4); identical literal
    // arithmetic on the oracle side so the doubles agree bit-for-bit.
    val alpha: Column =
      if (m == 16) lit(0.673)
      else if (m == 32) lit(0.697)
      else if (m == 64) lit(0.709)
      else lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val scale = 1L << 61 // covers rho <= 61 (p >= 4)
    val per = regs.groupBy(grpCol).agg(
      count(lit(1)).as("nreg"),
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 61 - mrho) AS DECIMAL(38,0))")).as("sp"))
    val vZero = lit(m.toLong) - col("nreg")
    val sumScaled =
      (col("sp") + vZero.cast("decimal(38,0)") * lit(scale).cast("decimal(38,0)"))
        .cast("double")
    val raw = alpha * lit(m.toDouble * m.toDouble) * lit(scale.toDouble) / sumScaled
    per.select(
        col(grpCol), lit(m.toLong).as("m"), vZero.as("v_zero"), raw.as("raw"))
      .withColumn("estimate",
        when(col("raw") <= lit(2.5 * m) && col("v_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")))
          .otherwise(col("raw")))
      .withColumnRenamed("raw", "raw_estimate")
  }
}
