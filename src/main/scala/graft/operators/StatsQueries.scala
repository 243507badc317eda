package graft.operators

import graft.Tables
import graft.catalog.Guess
import graft.functions.Correlation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The CORRELATION / CORRELATION PVALUE estimator family (SURVEY §2.4,
  * §2.7) + GUESS SCHEMA, exposed as driver-checkable queries. Every
  * p-value key carries a DuckDB oracle: algebraic survival functions at
  * fixed df (s05/s06/s08-s12), and the general-df incomplete beta
  * itself for the t-test (s04/s13) — the same Lentz continued fraction
  * `SpecialMath.betacf` runs, evaluated DuckDB-side as a recursive CTE.
  */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def oneRow(spark: SparkSession, name: String, value: Double): DataFrame = {
    import spark.implicits._
    Seq(value).toDF(name)
  }

  /** CORRELATION numerical×numerical = Pearson r² — fully declarative
    * single-agg plan (distributed co-moments, whole-stage codegen). */
  val s01CorrPearson: Q = (spark, dir) => {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity").isNotNull && col("l_extendedprice").isNotNull)
      .agg(round(pow(corr(col("l_quantity"), col("l_extendedprice")), 2), 6)
        .as("corr_r2"))
  }

  val s01Sql: String =
    """SELECT round(pow(corr(l_quantity, l_extendedprice), 2), 6) AS corr_r2
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL""".stripMargin

  /** CORRELATION nominal×nominal = Cramér's φ. The contingency table,
    * its zero cells, and the χ² reduction are all computed distributedly;
    * only the scalar reaches the driver. */
  val s02CramerPhi: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "cramer_phi",
      round6(Correlation.cramerPhi(li, "l_returnflag", "l_linestatus")))
  }

  val s02Sql: String =
    """WITH pair AS (
      |  SELECT l_returnflag AS x0, l_linestatus AS x1 FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL),
      |cells AS (SELECT x0, x1, count(*)::DOUBLE AS obs FROM pair GROUP BY x0, x1),
      |m0 AS (SELECT x0, count(*)::DOUBLE AS rt FROM pair GROUP BY x0),
      |m1 AS (SELECT x1, count(*)::DOUBLE AS ct FROM pair GROUP BY x1),
      |tot AS (SELECT count(*)::DOUBLE AS n FROM pair),
      |grid AS (
      |  SELECT m0.x0, m1.x1, coalesce(cells.obs, 0) AS obs,
      |         m0.rt * m1.ct / tot.n AS expected
      |  FROM m0 CROSS JOIN m1 CROSS JOIN tot
      |  LEFT JOIN cells ON cells.x0 = m0.x0 AND cells.x1 = m1.x1),
      |chi AS (
      |  SELECT sum(pow(obs - expected, 2) / expected) AS chi2,
      |         (SELECT count(DISTINCT x0) FROM pair) AS n0,
      |         (SELECT count(DISTINCT x1) FROM pair) AS n1,
      |         (SELECT n FROM tot) AS n
      |  FROM grid)
      |SELECT round(sqrt(chi2 / (n * (least(n0, n1) - 1))), 6) AS cramer_phi
      |FROM chi""".stripMargin

  /** CORRELATION nominal×numerical = one-way ANOVA R². */
  val s03AnovaR2: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "anova_r2",
      round6(Correlation.anovaR2(li, "l_returnflag", "l_extendedprice")))
  }

  val s03Sql: String =
    """WITH pair AS (
      |  SELECT l_returnflag AS g, l_extendedprice AS y FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
      |grp AS (
      |  SELECT g, count(*)::DOUBLE AS n_g, avg(y) AS mean_g,
      |         var_pop(y) * count(*) AS m2_g
      |  FROM pair GROUP BY g),
      |ov AS (
      |  SELECT sum(n_g) AS n, count(*)::DOUBLE AS k,
      |         sum(n_g * mean_g) / sum(n_g) AS gmean
      |  FROM grp),
      |st AS (
      |  SELECT sum(n_g * pow(mean_g - ov.gmean, 2)) / (ov.k - 1) AS bgv,
      |         sum(m2_g) / (ov.n - ov.k) AS wgv,
      |         ov.n AS n, ov.k AS k
      |  FROM grp CROSS JOIN ov GROUP BY ov.n, ov.k, ov.gmean)
      |SELECT round(1 - 1 / (1 + (bgv / wgv) * ((k - 1) / (n - k))), 6) AS anova_r2
      |FROM st""".stripMargin

  /** CORRELATION PVALUE numerical×numerical (two-sided t-test) at the
    * data's own df = n−2. Oracled at GENERAL df (round 6): the DuckDB
    * side evaluates the same regularized-incomplete-beta continued
    * fraction (Lentz) the Scala `SpecialMath.incBeta` runs, as a
    * recursive CTE — p = I_{1−r²}(df/2, 1/2). */
  val s04PearsonPValue: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "corr_pvalue",
      round6(Correlation.pearsonPValue(li, "l_quantity", "l_extendedprice")))
  }

  /** DuckDB SQL for the two-sided Pearson t-test p-value at general df:
    * the regularized incomplete beta I_x(df/2, 1/2) with x = 1 − r²,
    * branch-swapped into the convergent region and evaluated with the
    * SAME Lentz continued fraction as `SpecialMath.betacf`, unrolled as
    * a 200-step recursive CTE (two Lentz sub-steps per row; FpMin
    * clamps mirrored). `pairCte` must define pair(x0, x1). */
  private def tPValueSql(pairCte: String): String =
    s"""WITH RECURSIVE
       |pair AS ($pairCte),
       |st AS (
       |  SELECT covar_pop(x0, x1) / (stddev_pop(x0) * stddev_pop(x1)) AS r,
       |         count(*)::DOUBLE - 2 AS df
       |  FROM pair),
       |par AS (
       |  SELECT df,
       |         CASE WHEN 1 - r*r >= (df/2 + 1) / (df/2 + 2.5)
       |              THEN r*r ELSE 1 - r*r END AS xx,
       |         CASE WHEN 1 - r*r >= (df/2 + 1) / (df/2 + 2.5)
       |              THEN 0.5 ELSE df/2 END AS a,
       |         CASE WHEN 1 - r*r >= (df/2 + 1) / (df/2 + 2.5)
       |              THEN df/2 ELSE 0.5 END AS b,
       |         (1 - r*r >= (df/2 + 1) / (df/2 + 2.5)) AS swapped
       |  FROM st),
       |cf AS (
       |  SELECT 1 AS m, 1.0::DOUBLE AS c,
       |         1.0 / (CASE WHEN abs(1 - (a+b)*xx/(a+1)) < 1e-300
       |                     THEN 1e-300 ELSE 1 - (a+b)*xx/(a+1) END) AS d,
       |         1.0 / (CASE WHEN abs(1 - (a+b)*xx/(a+1)) < 1e-300
       |                     THEN 1e-300 ELSE 1 - (a+b)*xx/(a+1) END) AS h
       |  FROM par
       |  UNION ALL
       |  SELECT m + 1, c2, d2, h * d1 * c1 * d2 * c2
       |  FROM (
       |    SELECT m, h,
       |      m*(b-m)*xx / ((a-1+2*m)*(a+2*m)) AS aa1,
       |      1.0 / (CASE WHEN abs(1 + aa1*d) < 1e-300
       |             THEN 1e-300 ELSE 1 + aa1*d END) AS d1,
       |      CASE WHEN abs(1 + aa1/c) < 1e-300
       |           THEN 1e-300 ELSE 1 + aa1/c END AS c1,
       |      -(a+m)*(a+b+m)*xx / ((a+2*m)*(a+1+2*m)) AS aa2,
       |      1.0 / (CASE WHEN abs(1 + aa2*d1) < 1e-300
       |             THEN 1e-300 ELSE 1 + aa2*d1 END) AS d2,
       |      CASE WHEN abs(1 + aa2/c1) < 1e-300
       |           THEN 1e-300 ELSE 1 + aa2/c1 END AS c2
       |    FROM cf, par WHERE m < 200)),
       |done AS (SELECT h FROM cf WHERE m = 200)
       |SELECT round(CASE WHEN swapped
       |  THEN 1 - exp(lgamma(a+b) - lgamma(a) - lgamma(b)
       |               + a*ln(xx) + b*ln(1-xx)) * h / a
       |  ELSE exp(lgamma(a+b) - lgamma(a) - lgamma(b)
       |           + a*ln(xx) + b*ln(1-xx)) * h / a
       |  END, 6) AS corr_pvalue
       |FROM done, par""".stripMargin

  val s04Sql: String = tPValueSql(
    """
      |  SELECT l_quantity AS x0, l_extendedprice AS x1 FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL""".stripMargin)

  /** CORRELATION PVALUE nominal×nominal (χ² independence test).
    * returnflag×linestatus is a 3×2 contingency, so df = 2 and the χ²
    * survival has the closed form e^(−χ²/2) — DuckDB-expressible, so
    * this key is oracled (round 6). */
  val s05CramerPValue: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "cramer_pvalue",
      round6(Correlation.cramerPhiPValue(li, "l_returnflag", "l_linestatus")))
  }

  val s05Sql: String =
    """WITH pair AS (
      |  SELECT l_returnflag AS x0, l_linestatus AS x1 FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL),
      |cells AS (SELECT x0, x1, count(*)::DOUBLE AS obs FROM pair GROUP BY x0, x1),
      |m0 AS (SELECT x0, count(*)::DOUBLE AS rt FROM pair GROUP BY x0),
      |m1 AS (SELECT x1, count(*)::DOUBLE AS ct FROM pair GROUP BY x1),
      |tot AS (SELECT count(*)::DOUBLE AS n FROM pair),
      |grid AS (
      |  SELECT m0.x0, m1.x1, coalesce(cells.obs, 0) AS obs,
      |         m0.rt * m1.ct / tot.n AS expected
      |  FROM m0 CROSS JOIN m1 CROSS JOIN tot
      |  LEFT JOIN cells ON cells.x0 = m0.x0 AND cells.x1 = m1.x1),
      |chi AS (SELECT sum(pow(obs - expected, 2) / expected) AS chi2 FROM grid)
      |SELECT round(exp(-chi2 / 2), 6) AS cramer_pvalue FROM chi""".stripMargin

  /** CORRELATION PVALUE nominal×numerical (F-test). returnflag has 3
    * groups, so d1 = 2 and the F survival has the closed form
    * (1 + 2x/d2)^(−d2/2) for ANY d2 = n−k — general-df on the second
    * parameter, DuckDB-expressible, oracled (round 6). */
  val s06AnovaPValue: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "anova_pvalue",
      round6(Correlation.anovaPValue(li, "l_returnflag", "l_extendedprice")))
  }

  val s06Sql: String =
    """WITH pair AS (
      |  SELECT l_returnflag AS g, l_extendedprice AS y FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL),
      |grp AS (
      |  SELECT g, count(*)::DOUBLE AS n_g, avg(y) AS mean_g,
      |         var_pop(y) * count(*) AS m2_g
      |  FROM pair GROUP BY g),
      |ov AS (
      |  SELECT sum(n_g) AS n, count(*)::DOUBLE AS k,
      |         sum(n_g * mean_g) / sum(n_g) AS gmean
      |  FROM grp),
      |st AS (
      |  SELECT sum(n_g * pow(mean_g - ov.gmean, 2)) / (ov.k - 1) AS bgv,
      |         sum(m2_g) / (ov.n - ov.k) AS wgv,
      |         ov.n AS n, ov.k AS k
      |  FROM grp CROSS JOIN ov GROUP BY ov.n, ov.k, ov.gmean)
      |SELECT round(pow(1 + 2 * (bgv / wgv) / (n - k), -(n - k) / 2), 6) AS anova_pvalue
      |FROM st""".stripMargin

  /** s13: the t p-value at a SMALL general df (32 rows → df=30, p well
    * inside (0,1)) through the same incomplete-beta continued fraction —
    * s04's full-table df is ~n, so this key pins the small-df corner of
    * the general path against the same recursive-CTE oracle. */
  val s13TPValueDf30: Q = (spark, dir) => {
    val sub = Tables.load(spark, dir, "lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(32)
    oneRow(spark, "corr_pvalue",
      round6(Correlation.pearsonPValue(sub, "l_quantity", "l_extendedprice")))
  }

  val s13Sql: String = tPValueSql(
    """
      |  SELECT x0, x1 FROM (
      |    SELECT l_quantity AS x0, l_extendedprice AS x1,
      |           l_orderkey, l_linenumber FROM lineitem
      |    ORDER BY l_orderkey, l_linenumber LIMIT 32)""".stripMargin)

  // p-values at known degrees of freedom have closed forms DuckDB can
  // compute — s05/s06/s08-s12 pin the special-function paths against
  // hard oracles; s04/s13 oracle the general-df incomplete beta itself
  // (Lentz continued fraction as a recursive CTE). Closed forms used:
  //   t, df=2:  2·sf(|t|) = 1 − u,             u = |t|/√(df+t²)
  //   t, df=4:  2·sf(|t|) = 1 − (u/2)(3 − u²)
  //   χ², df=2: sf(x) = e^(−x/2)
  //   χ², df=6: sf(x) = e^(−x/2)(1 + x/2 + x²/8)
  //   F,  d1=2: sf(x) = (1 + 2x/d2)^(−d2/2)

  /** s08: Pearson PVALUE over exactly 4 rows → t-test with df=2. */
  val s08TPValueDf2: Q = (spark, dir) => {
    val four = Tables.load(spark, dir, "lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(4)
    oneRow(spark, "corr_pvalue",
      round6(Correlation.pearsonPValue(four, "l_quantity", "l_extendedprice")))
  }

  val s08Sql: String =
    """WITH four AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
      |  ORDER BY l_orderkey, l_linenumber LIMIT 4),
      |c AS (SELECT covar_pop(x, y) / (stddev_pop(x) * stddev_pop(y)) AS r FROM four),
      |t AS (SELECT abs(r) * sqrt(2 / (1 - r * r)) AS tt FROM c)
      |SELECT round(1 - tt / sqrt(2 + tt * tt), 6) AS corr_pvalue FROM t""".stripMargin

  /** s09: χ² PVALUE over a 2×3 contingency (line-number parity ×
    * returnflag) → df=2, sf = e^(−χ²/2). */
  val s09Chi2PValueDf2: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("parity", (col("l_linenumber") % 2).cast("string"))
    oneRow(spark, "cramer_pvalue",
      round6(Correlation.cramerPhiPValue(li, "parity", "l_returnflag")))
  }

  val s09Sql: String =
    """WITH pair AS (
      |  SELECT (l_linenumber % 2)::VARCHAR AS x0, l_returnflag AS x1 FROM lineitem
      |  WHERE l_linenumber IS NOT NULL AND l_returnflag IS NOT NULL),
      |cells AS (SELECT x0, x1, count(*)::DOUBLE AS obs FROM pair GROUP BY x0, x1),
      |m0 AS (SELECT x0, count(*)::DOUBLE AS rt FROM pair GROUP BY x0),
      |m1 AS (SELECT x1, count(*)::DOUBLE AS ct FROM pair GROUP BY x1),
      |tot AS (SELECT count(*)::DOUBLE AS n FROM pair),
      |grid AS (
      |  SELECT m0.x0, m1.x1, coalesce(cells.obs, 0) AS obs,
      |         m0.rt * m1.ct / tot.n AS expected
      |  FROM m0 CROSS JOIN m1 CROSS JOIN tot
      |  LEFT JOIN cells ON cells.x0 = m0.x0 AND cells.x1 = m1.x1),
      |chi AS (SELECT sum(pow(obs - expected, 2) / expected) AS chi2 FROM grid)
      |SELECT round(exp(-chi2 / 2), 6) AS cramer_pvalue FROM chi""".stripMargin

  /** s10: ANOVA F PVALUE with returnflag's 3 groups → d1=2, closed-form
    * survival; y = l_partkey (independent of returnflag ⇒ p well away
    * from 0 and 1). */
  val s10FPValueD12: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
    oneRow(spark, "anova_pvalue",
      round6(Correlation.anovaPValue(li, "l_returnflag", "l_partkey")))
  }

  val s10Sql: String =
    """WITH pair AS (
      |  SELECT l_returnflag AS g, l_partkey::DOUBLE AS y FROM lineitem
      |  WHERE l_returnflag IS NOT NULL AND l_partkey IS NOT NULL),
      |grp AS (
      |  SELECT g, count(*)::DOUBLE AS n_g, avg(y) AS mean_g,
      |         var_pop(y) * count(*) AS m2_g
      |  FROM pair GROUP BY g),
      |ov AS (
      |  SELECT sum(n_g) AS n, count(*)::DOUBLE AS k,
      |         sum(n_g * mean_g) / sum(n_g) AS gmean
      |  FROM grp),
      |st AS (
      |  SELECT sum(n_g * pow(mean_g - ov.gmean, 2)) / (ov.k - 1) AS bgv,
      |         sum(m2_g) / (ov.n - ov.k) AS wgv,
      |         ov.n AS n, ov.k AS k
      |  FROM grp CROSS JOIN ov GROUP BY ov.n, ov.k, ov.gmean)
      |SELECT round(pow(1 + 2 * (bgv / wgv) / (n - k), -(n - k) / 2), 6) AS anova_pvalue
      |FROM st""".stripMargin

  /** s11: Pearson PVALUE over exactly 6 rows → t-test with df=4; the
    * even-df t survival is algebraic: 2·sf(|t|) = 1 − (u/2)(3 − u²)
    * with u = |t|/√(4+t²) — pins the t path at a second fixed df. */
  val s11TPValueDf4: Q = (spark, dir) => {
    val six = Tables.load(spark, dir, "lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(6)
    oneRow(spark, "corr_pvalue",
      round6(Correlation.pearsonPValue(six, "l_quantity", "l_extendedprice")))
  }

  val s11Sql: String =
    """WITH six AS (
      |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
      |  ORDER BY l_orderkey, l_linenumber LIMIT 6),
      |c AS (SELECT covar_pop(x, y) / (stddev_pop(x) * stddev_pop(y)) AS r FROM six),
      |t AS (SELECT abs(r) * sqrt(4 / (1 - r * r)) AS tt FROM c),
      |u AS (SELECT tt / sqrt(4 + tt * tt) AS uu FROM t)
      |SELECT round(1 - (uu / 2) * (3 - uu * uu), 6) AS corr_pvalue FROM u""".stripMargin

  /** s12: χ² PVALUE over a 4×3 contingency (line-number mod 4 ×
    * returnflag) → df=6, sf = e^(−x/2)(1 + x/2 + x²/8) — pins the
    * regularized-gamma path at a second even df. */
  val s12Chi2PValueDf6: Q = (spark, dir) => {
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("quad", (col("l_linenumber") % 4).cast("string"))
    oneRow(spark, "cramer_pvalue",
      round6(Correlation.cramerPhiPValue(li, "quad", "l_returnflag")))
  }

  val s12Sql: String =
    """WITH pair AS (
      |  SELECT (l_linenumber % 4)::VARCHAR AS x0, l_returnflag AS x1 FROM lineitem
      |  WHERE l_linenumber IS NOT NULL AND l_returnflag IS NOT NULL),
      |cells AS (SELECT x0, x1, count(*)::DOUBLE AS obs FROM pair GROUP BY x0, x1),
      |m0 AS (SELECT x0, count(*)::DOUBLE AS rt FROM pair GROUP BY x0),
      |m1 AS (SELECT x1, count(*)::DOUBLE AS ct FROM pair GROUP BY x1),
      |tot AS (SELECT count(*)::DOUBLE AS n FROM pair),
      |grid AS (
      |  SELECT m0.x0, m1.x1, coalesce(cells.obs, 0) AS obs,
      |         m0.rt * m1.ct / tot.n AS expected
      |  FROM m0 CROSS JOIN m1 CROSS JOIN tot
      |  LEFT JOIN cells ON cells.x0 = m0.x0 AND cells.x1 = m1.x1),
      |chi AS (SELECT sum(pow(obs - expected, 2) / expected) AS chi2 FROM grid)
      |SELECT round(exp(-chi2 / 2) * (1 + chi2 / 2 + chi2 * chi2 / 8), 6)
      |  AS cramer_pvalue FROM chi""".stripMargin

  /** GUESS SCHEMA FOR customer (reference: src/bql.py:220-252) — one
    * distributed pass; reasons omitted from the dump for stability. */
  val s07GuessSchema: Q = (spark, dir) => {
    Guess.guessSchema(Tables.load(spark, dir, "customer"))
      .select("column", "stattype", "num_distinct")
      .orderBy("column")
  }

  /** DuckDB oracle for GUESS SCHEMA (reference decision procedure,
    * src/guess.py:227-297): stack every column as trimmed strings with
    * the null markers removed, aggregate per-column stats once, then the
    * same CASE ladder — only-one-value → ignore; first keyable column →
    * key; many distinct numbers → numerical; high-distinct → ignore
    * (pseudo-key); else nominal. The >90%-dominant-value nullify-reguess
    * recursion is not expressible in one SQL pass and never fires on this
    * data (GuessSpec pins that branch). */
  private def guessOracle(table: String, cols: Seq[String], withReason: Boolean): String = {
    val vals = cols.zipWithIndex.map { case (c, i) =>
      s"""SELECT $i AS ord, '$c' AS colname,
         |  CASE WHEN trim(CAST($c AS VARCHAR)) IN ('','N/A','none','None')
         |       THEN NULL ELSE trim(CAST($c AS VARCHAR)) END AS v
         |FROM $table""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val reason = if (!withReason) "" else
      """,
        |  CASE WHEN nd < 2 THEN 'There is only one unique value.'
        |       WHEN is_key THEN 'This was the first column in the table with all distinct integers or strings.'
        |       WHEN numericable AND nd > 20 AND CAST(nd AS DOUBLE) / n > 0.02
        |         THEN 'There are at least 20 unique numerical values, and they account for at least 2 percent of all values in the column.'
        |       WHEN nd > 20 AND CAST(nd AS DOUBLE) / n > 0.9
        |         THEN 'There are more than 20 distinct values and they account for more than 90 percent of the values in the column, so the column is ignored as a pseudo-key.'
        |       WHEN numericable
        |         THEN 'There are fewer than 20 distinct numerical values, or the ratio of distinct values to total values is low.'
        |       ELSE 'The values are nonnumerical.' END AS reason""".stripMargin
    s"""WITH tot AS (SELECT count(*) AS n FROM $table),
       |vals AS (
       |  $vals
       |),
       |cnts AS (SELECT ord, colname, v, count(*) AS c FROM vals
       |         WHERE v IS NOT NULL GROUP BY 1, 2, 3),
       |st AS (
       |  SELECT ord, colname, count(*) AS nd, CAST(sum(c) AS BIGINT) AS nonnull,
       |         bool_and(regexp_matches(v, '^[+-]?[0-9]+$$')) AS all_int,
       |         bool_and(try_cast(v AS DOUBLE) IS NOT NULL) AS all_float,
       |         bool_and(coalesce(try_cast(v AS DOUBLE) = floor(try_cast(v AS DOUBLE)), FALSE)) AS all_integral
       |  FROM cnts GROUP BY 1, 2),
       |dec0 AS (
       |  SELECT st.*, tot.n,
       |         (nonnull = n AND nd = n AND
       |          (all_int OR (all_float AND all_integral) OR NOT all_float)) AS keyable,
       |         (all_int OR all_float) AS numericable
       |  FROM st, tot),
       |dec AS (SELECT *,
       |          keyable AND ord = min(CASE WHEN keyable THEN ord END) OVER () AS is_key
       |        FROM dec0)
       |SELECT colname AS "column",
       |  CASE WHEN nd < 2 THEN 'ignore'
       |       WHEN is_key THEN 'key'
       |       WHEN numericable AND nd > 20 AND CAST(nd AS DOUBLE) / n > 0.02 THEN 'numerical'
       |       WHEN nd > 20 AND CAST(nd AS DOUBLE) / n > 0.9 THEN 'ignore'
       |       ELSE 'nominal' END AS stattype,
       |  CAST(nd AS BIGINT) AS num_distinct$reason
       |FROM dec ORDER BY "column"""".stripMargin
  }

  val s07Sql: String = guessOracle("customer",
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    withReason = false)

  /** Shared with BqlQueries' b05 (GUESS SCHEMA FOR documents). */
  val b05Sql: String = guessOracle("documents",
    Seq("doc_id", "text", "lang", "source", "n_chars"),
    withReason = true)

  val queries: Map[String, Q] = Map(
    "s01_corr_pearson" -> s01CorrPearson,
    "s02_cramer_phi" -> s02CramerPhi,
    "s03_anova_r2" -> s03AnovaR2,
    "s04_pearson_pvalue" -> s04PearsonPValue,
    "s05_cramer_pvalue" -> s05CramerPValue,
    "s06_anova_pvalue" -> s06AnovaPValue,
    "s07_guess_schema" -> s07GuessSchema,
    "s08_t_pvalue_df2" -> s08TPValueDf2,
    "s09_chi2_pvalue_df2" -> s09Chi2PValueDf2,
    "s10_f_pvalue_d1_2" -> s10FPValueD12,
    "s11_t_pvalue_df4" -> s11TPValueDf4,
    "s12_chi2_pvalue_df6" -> s12Chi2PValueDf6,
    "s13_t_pvalue_df30" -> s13TPValueDf30)

  val oracles: Map[String, String] = Map(
    "s07_guess_schema" -> s07Sql,
    "s01_corr_pearson" -> s01Sql,
    "s02_cramer_phi" -> s02Sql,
    "s03_anova_r2" -> s03Sql,
    "s04_pearson_pvalue" -> s04Sql,
    "s05_cramer_pvalue" -> s05Sql,
    "s06_anova_pvalue" -> s06Sql,
    "s08_t_pvalue_df2" -> s08Sql,
    "s09_chi2_pvalue_df2" -> s09Sql,
    "s10_f_pvalue_d1_2" -> s10Sql,
    "s11_t_pvalue_df4" -> s11Sql,
    "s12_chi2_pvalue_df6" -> s12Sql,
    "s13_t_pvalue_df30" -> s13Sql)
}
