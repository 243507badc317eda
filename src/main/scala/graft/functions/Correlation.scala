package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The CORRELATION / CORRELATION PVALUE estimator family (reference:
  * src/bqlfn.py:72-281, src/stats.py). The reference pulls both columns
  * to the driver and loops in Python; here every method reduces the data
  * distributedly (one aggregation pass over the pair of columns) and only
  * O(1) or O(#levels) state reaches the driver — the shape that survives
  * 100 TB.
  *
  * Method dispatch by statistical-type pair matches the reference's
  * table (src/bqlfn.py:240-281): numerical×numerical → Pearson r²,
  * nominal×nominal → Cramér's φ, nominal×numerical → one-way ANOVA R²,
  * cyclic treated as numerical.
  */
object Correlation {

  /** Rows where both columns are non-null — the reference's extraction
    * predicate (src/bqlfn.py:54-69). */
  private def bothNotNull(df: DataFrame, c0: String, c1: String): DataFrame =
    df.filter(col(c0).isNotNull && col(c1).isNotNull)

  /** Pearson r (clamped to [-1,1]) of two numerical columns; NaN when
    * n == 0 or either column is constant (reference: src/stats.py:29-57).
    * One distributed agg over co-moments; the division happens on the
    * driver so a zero denominator yields NaN rather than tripping
    * Spark 4's ANSI divide-by-zero. */
  def pearsonR(df: DataFrame, c0: String, c1: String): Double = {
    val row = bothNotNull(df, c0, c1)
      .agg(
        covar_pop(col(c0), col(c1)).as("cov"),
        stddev_pop(col(c0)).as("s0"),
        stddev_pop(col(c1)).as("s1"),
        count(lit(1)).as("n")).head()
    if (row.getLong(3) == 0L || row.isNullAt(0)) return Double.NaN
    val den = row.getDouble(1) * row.getDouble(2)
    if (den == 0.0) Double.NaN
    else math.max(-1.0, math.min(1.0, row.getDouble(0) / den))
  }

  /** CORRELATION for numerical×numerical: r². */
  def pearsonR2(df: DataFrame, c0: String, c1: String): Double = {
    val r = pearsonR(df, c0, c1)
    r * r
  }

  /** CORRELATION PVALUE for numerical×numerical: two-sided t-test on
    * t = r sqrt((n-2)/(1-r²)) (reference: src/bqlfn.py:115-128). */
  def pearsonPValue(df: DataFrame, c0: String, c1: String): Double = {
    val row = bothNotNull(df, c0, c1)
      .agg(
        covar_pop(col(c0), col(c1)).as("cov"),
        stddev_pop(col(c0)).as("s0"),
        stddev_pop(col(c1)).as("s1"),
        count(lit(1)).as("n")).head()
    val n = row.getLong(3)
    if (n <= 2 || row.isNullAt(0)) return Double.NaN
    val den = row.getDouble(1) * row.getDouble(2)
    val r =
      if (den == 0.0) Double.NaN
      else math.max(-1.0, math.min(1.0, row.getDouble(0) / den))
    if (r.isNaN) Double.NaN
    else if (r == 1.0 || r == -1.0) 0.0
    else {
      val t = r * math.sqrt((n - 2).toDouble / (1.0 - r * r))
      2.0 * SpecialMath.tCdf(-math.abs(t), (n - 2).toDouble)
    }
  }

  /** χ² statistic of independence + level counts, computed distributedly:
    * the contingency table is a groupBy over the pair (zero cells join in
    * via the level cross product), and the χ² reduction is a second tiny
    * agg — nothing larger than #levels² ever leaves the executors. */
  def chi2Contingency(df: DataFrame, c0: String, c1: String): (Double, Long, Long, Long) = {
    val pair = bothNotNull(df, c0, c1).select(col(c0).as("x0"), col(c1).as("x1"))
    // ONE scan+shuffle of the data builds the contingency cells; the
    // marginals, total, and χ² all derive from the cells relation, so
    // what gets cached is the ≤ levels²-row aggregate — never the n-row
    // pair (at 100 TB the pair cache was the cost, and the data was
    // scanned once per marginal besides)
    val cells = pair.groupBy("x0", "x1").agg(count(lit(1)).as("obs")).cache()
    try {
      val m0 = cells.groupBy("x0").agg(sum(col("obs")).as("row_total"))
      val m1 = cells.groupBy("x1").agg(sum(col("obs")).as("col_total"))
      val tot = cells.agg(sum(col("obs")).as("n"))
      // full outer product of levels (including zero-observation cells,
      // which still contribute (0-e)^2/e to the statistic); the 1-row
      // total crossJoins in so the whole reduction is ONE driver action
      // over the cached cells relation instead of two
      val full = m0.crossJoin(m1).crossJoin(tot)
        .join(cells, Seq("x0", "x1"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .withColumn("expected", col("row_total") * col("col_total") / col("n").cast("double"))
        .agg(
          sum(pow(col("obs") - col("expected"), 2) / col("expected")).as("chi2"),
          countDistinct(col("x0")).as("n0"),
          countDistinct(col("x1")).as("n1"),
          max(col("n")).as("n"))
        .head()
      if (full.isNullAt(0) || full.isNullAt(3)) (Double.NaN, 0L, 0L, 0L)
      else (full.getDouble(0), full.getLong(1), full.getLong(2), full.getLong(3))
    } finally cells.unpersist()
  }

  /** CORRELATION for nominal×nominal: Cramér's φ =
    * sqrt(χ² / (n (min(levels)-1))); NaN when a column is constant
    * (reference: src/bqlfn.py:130-179). */
  def cramerPhi(df: DataFrame, c0: String, c1: String): Double = {
    val (chi2, n0, n1, n) = chi2Contingency(df, c0, c1)
    if (chi2.isNaN || n == 0L) Double.NaN
    else if (math.min(n0, n1) <= 1L) Double.NaN
    else math.sqrt(chi2 / (n * (math.min(n0, n1) - 1)))
  }

  /** CORRELATION PVALUE for nominal×nominal: χ² test of independence. */
  def cramerPhiPValue(df: DataFrame, c0: String, c1: String): Double = {
    val (chi2, n0, n1, _) = chi2Contingency(df, c0, c1)
    if (chi2.isNaN || math.min(n0, n1) <= 1L) return Double.NaN
    val dof = (n0 - 1) * (n1 - 1)
    if (dof <= 0) Double.NaN
    else SpecialMath.chi2Sf(chi2, dof.toDouble)
  }

  /** One-way ANOVA F statistic + group count from a single distributed
    * groupBy: per-group (count, mean, M2=var_pop*count) are algebraic
    * aggregates; the K-row result reduces on the driver. */
  def anovaF(df: DataFrame, groupCol: String, yCol: String): (Double, Long, Long) = {
    val pair = bothNotNull(df, groupCol, yCol)
    val groups = pair.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_g"),
        avg(col(yCol)).as("mean_g"),
        (var_pop(col(yCol)) * count(lit(1))).as("m2_g"))
      .collect()
    val k = groups.length.toLong
    val n = groups.map(_.getLong(1)).sum
    if (k == 0L || k == 1L || k == n) return (Double.NaN, k, n)
    val overallMean = groups.map(r => r.getLong(1) * r.getDouble(2)).sum / n
    val bgv = groups.map { r =>
      r.getLong(1) * math.pow(r.getDouble(2) - overallMean, 2) / (k - 1).toDouble
    }.sum
    val wgv = groups.map(r => if (r.isNullAt(3)) 0.0 else r.getDouble(3)).sum / (n - k).toDouble
    val f =
      if (wgv == 0.0) { if (bgv == 0.0) Double.NaN else Double.PositiveInfinity }
      else bgv / wgv
    (f, k, n)
  }

  /** CORRELATION for nominal×numerical: ANOVA R² =
    * 1 - 1/(1 + F (K-1)/(n-K)) (reference: src/bqlfn.py:181-232). */
  def anovaR2(df: DataFrame, groupCol: String, yCol: String): Double = {
    val (f, k, n) = anovaF(df, groupCol, yCol)
    if (f.isNaN) Double.NaN
    else 1.0 - 1.0 / (1.0 + f * ((k - 1).toDouble / (n - k).toDouble))
  }

  /** CORRELATION PVALUE for nominal×numerical: F-test survival. */
  def anovaPValue(df: DataFrame, groupCol: String, yCol: String): Double = {
    val (f, k, n) = anovaF(df, groupCol, yCol)
    if (f.isNaN) Double.NaN
    else SpecialMath.fSf(f, (k - 1).toDouble, (n - k).toDouble)
  }

  import graft.catalog.StatType
  import graft.catalog.StatType._

  /** Correlation-method dispatch by stattype pair (reference:
    * src/bqlfn.py:240-281 — cyclic behaves as numerical). */
  def correlation(df: DataFrame, c0: String, st0: StatType, c1: String, st1: StatType): Double =
    (effective(st0), effective(st1)) match {
      case (Numerical, Numerical) => pearsonR2(df, c0, c1)
      case (Nominal, Nominal)     => cramerPhi(df, c0, c1)
      case (Nominal, Numerical)   => anovaR2(df, c0, c1)
      case (Numerical, Nominal)   => anovaR2(df, c1, c0)
      case other => throw new IllegalArgumentException(
        s"No correlation method for $other")
    }

  def correlationPValue(df: DataFrame, c0: String, st0: StatType, c1: String, st1: StatType): Double =
    (effective(st0), effective(st1)) match {
      case (Numerical, Numerical) => pearsonPValue(df, c0, c1)
      case (Nominal, Nominal)     => cramerPhiPValue(df, c0, c1)
      case (Nominal, Numerical)   => anovaPValue(df, c0, c1)
      case (Numerical, Nominal)   => anovaPValue(df, c1, c0)
      case other => throw new IllegalArgumentException(
        s"No correlation p-value method for $other")
    }

  /** Cyclic is treated as numerical for correlation purposes; boolean,
    * counts, magnitude etc. reduce to their effective family. */
  private def effective(st: StatType): StatType = st match {
    case Cyclic | Counts | Magnitude | NumericalRanged => Numerical
    case Boolean | UnboundedNominal => Nominal
    case s => s
  }
}
