package graft.catalog

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Heuristic statistical-type guessing — `GUESS SCHEMA FOR t`
  * (reference: src/guess.py:92-346, surfaced at src/bql.py:220-252).
  *
  * The reference materializes every column as a Python list and loops;
  * here the whole table is reduced in ONE distributed pass: all columns
  * are stacked to (column-index, value-as-string) pairs with posexplode,
  * grouped once, and every per-column decision then runs against the
  * (small, cached) per-value count relation. The nullify-and-reguess
  * recursion (a value covering >90% of a column is treated as null and
  * the remainder re-guessed) re-aggregates only the count relation,
  * never the base table.
  */
object Guess {

  /** Default knobs (reference: src/guess.py:120-130). */
  val defaultNullValues: Set[String] = Set("", "N/A", "none", "None")
  val defaultNumcatCount = 20
  val defaultNumcatRatio = 0.02
  val defaultDistinctRatio = 0.9
  val defaultNullifyRatio = 0.9

  final case class ColumnGuess(
      column: String, stattype: StatType, numDistinct: Long, reason: String)

  def guessStattypes(
      df: DataFrame,
      nullValues: Set[String] = defaultNullValues,
      numcatCount: Int = defaultNumcatCount,
      numcatRatio: Double = defaultNumcatRatio,
      distinctRatio: Double = defaultDistinctRatio,
      nullifyRatio: Double = defaultNullifyRatio,
      overrides: Map[String, StatType] = Map.empty): Seq[ColumnGuess] = {

    val cols = df.columns.toSeq
    val dup = cols.groupBy(Names.casefold).collect { case (_, vs) if vs.size > 1 => vs.head }
    require(dup.isEmpty, s"Duplicate column names: ${dup.mkString(", ")}")
    val overrideMap = overrides.map { case (k, v) => Names.casefold(k) -> v }
    val unknown = overrideMap.keySet -- cols.map(Names.casefold).toSet
    require(unknown.isEmpty, s"Unknown columns overridden: ${unknown.mkString(", ")}")

    // ONE pass over the base table: stack (colIdx, value) with nullified
    // null-markers, then count by (colIdx, value). Everything after this
    // operates on the aggregated count relation.
    val stringified = array(cols.map { c =>
      val s = trim(col(c).cast("string"))
      when(s.isin(nullValues.toSeq: _*), lit(null)).otherwise(s)
    }: _*)
    val counts = df.select(posexplode(stringified).as(Seq("ci", "v")))
      .groupBy("ci", "v").agg(count(lit(1)).as("cnt"))
      .cache()
    val totalLen = df.count()

    try {
      // ONE aggregation job computes every column's no-exclusion stats
      // (C rows collected); per-column jobs remain only for the rare
      // nullify-and-reguess recursion, which filters by exclusion set
      val statsAll = colStatsAll(counts)

      // key-override validation (reference guess.py:184-204): at most one
      // column may be overridden as the key, and that column must
      // actually be keyable — all values distinct, no nulls, integer /
      // integral-float / plain-string valued
      val keyOvers = cols.zipWithIndex.filter { case (n, _) =>
        overrideMap.get(Names.casefold(n)).contains(StatType.Key) }
      require(keyOvers.sizeIs <= 1,
        s"Multiple columns overridden as keys: ${keyOvers.map(_._1).mkString(", ")}")
      keyOvers.foreach { case (n, ci) =>
        val st = statsAll.getOrElse(ci, ColStats(0L, 0L, null, 0L, false, false, false))
        val keyable = st.nonNullCnt == totalLen && st.nDistinct == totalLen &&
          (st.allInt || (st.allFloat && st.allIntegral) || !st.allFloat)
        require(keyable, s"Column non-unique but specified as key: $n")
      }

      // first keyable column (after overrides' explicit keys) wins
      var haveKey = overrideMap.values.exists(_ == StatType.Key)

      cols.zipWithIndex.map { case (name, ci) =>
        val st0 = statsAll.getOrElse(ci, ColStats(0L, 0L, null, 0L, false, false, false))
        overrideMap.get(Names.casefold(name)) match {
          case Some(st) =>
            ColumnGuess(name, st, st0.nDistinct, "User override.")
          case None =>
            val g = guessColumn(counts, ci, totalLen, Set.empty, "",
              numcatCount, numcatRatio, distinctRatio, nullifyRatio, haveKey,
              precomputed = Some(st0))
            if (g.stattype == StatType.Key) haveKey = true
            g.copy(column = name)
        }
      }
    } finally { counts.unpersist(); () }
  }


  /** Per-column stats from the count relation with an exclusion set (the
    * values nullified so far by the reguess recursion). */
  private final case class ColStats(
      nDistinct: Long, nonNullCnt: Long, topValue: String, topCnt: Long,
      allInt: Boolean, allFloat: Boolean, allIntegral: Boolean)

  private val statAggs = Seq(
    count(lit(1)).as("ndist"),
    sum("cnt").as("nonnull"),
    max_by(col("v"), struct(col("cnt"), col("v"))).as("top_v"),
    max("cnt").as("top_cnt"),
    min(col("v").rlike("^[+-]?[0-9]+$").cast("int")).as("all_int"),
    min(expr("try_cast(v AS double)").isNotNull.cast("int")).as("all_float"),
    min((expr("try_cast(v AS double)") === floor(expr("try_cast(v AS double)")))
      .cast("int")).as("all_integral"))

  private def statsOf(row: Row, off: Int): ColStats =
    if (row.getLong(off) == 0L) ColStats(0L, 0L, null, 0L, false, false, false)
    else ColStats(row.getLong(off), row.getLong(off + 1), row.getString(off + 2),
      row.getLong(off + 3), row.getInt(off + 4) == 1, row.getInt(off + 5) == 1,
      !row.isNullAt(off + 6) && row.getInt(off + 6) == 1)

  /** All columns' no-exclusion stats in one aggregation over the cached
    * count relation (the per-column form runs a Spark job per column —
    * pure scheduling overhead on a metadata-sized input). */
  private def colStatsAll(counts: DataFrame): Map[Int, ColStats] =
    counts.filter(col("v").isNotNull)
      .groupBy("ci").agg(statAggs.head, statAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) -> statsOf(r, 1)).toMap

  private def colStats(counts: DataFrame, ci: Int, excluded: Set[String]): ColStats = {
    val live = counts.filter(col("ci") === ci && col("v").isNotNull &&
      (if (excluded.isEmpty) lit(true) else !col("v").isin(excluded.toSeq: _*)))
    statsOf(live.agg(statAggs.head, statAggs.tail: _*).head(), 0)
  }

  /** The reference's per-column decision procedure
    * (src/guess.py:227-297), driven by aggregated stats. */
  @annotation.tailrec
  private def guessColumn(
      counts: DataFrame, ci: Int, totalLen: Long, excluded: Set[String],
      reason: String, numcatCount: Int, numcatRatio: Double,
      distinctRatio: Double, nullifyRatio: Double, haveKey: Boolean,
      precomputed: Option[ColStats] = None): ColumnGuess = {

    val st = precomputed.getOrElse(colStats(counts, ci, excluded))

    if (st.nDistinct < 2) {
      ColumnGuess("", StatType.Ignore, st.nDistinct,
        s"$reason There is only one unique value.".trim)
    } else if (st.topCnt.toDouble / totalLen > nullifyRatio) {
      // nullify the dominant value and re-guess the remainder
      guessColumn(counts, ci, totalLen, excluded + st.topValue,
        s"$reason More than ${(100 * nullifyRatio).toInt} percent of the values " +
          "are the same, so the statistical type was guessed based on the " +
          "remainder of the values.",
        numcatCount, numcatRatio, distinctRatio, nullifyRatio, haveKey)
    } else {
      val numericable = st.allInt || st.allFloat
      val nullsPresent = excluded.nonEmpty || st.nonNullCnt < totalLen
      // keyable: no nulls, all values distinct, and values are integers,
      // integral floats, or plain (non-numeric) strings
      val keyable = !nullsPresent && st.nDistinct == totalLen &&
        (st.allInt || (st.allFloat && st.allIntegral) || !st.allFloat)
      if (!haveKey && keyable) {
        ColumnGuess("", StatType.Key, st.nDistinct,
          (s"$reason This was the first column in the table with all distinct " +
            "integers or strings.").trim)
      } else if (numericable && st.nDistinct > numcatCount &&
          st.nDistinct.toDouble / totalLen > numcatRatio) {
        ColumnGuess("", StatType.Numerical, st.nDistinct,
          (s"$reason There are at least $numcatCount unique numerical values, " +
            s"and they account for at least ${(100 * numcatRatio).toInt} percent " +
            "of all values in the column.").trim)
      } else if (st.nDistinct > numcatCount &&
          st.nDistinct.toDouble / totalLen > distinctRatio) {
        ColumnGuess("", StatType.Ignore, st.nDistinct,
          (s"$reason There are more than $numcatCount distinct values and they " +
            s"account for more than ${(100 * distinctRatio).toInt} percent of the " +
            "values in the column, so the column is ignored as a pseudo-key.").trim)
      } else {
        ColumnGuess("", StatType.Nominal, st.nDistinct,
          (if (numericable)
            s"$reason There are fewer than $numcatCount distinct numerical " +
              "values, or the ratio of distinct values to total values is low."
          else s"$reason The values are nonnumerical.").trim)
      }
    }
  }

  /** `GUESS SCHEMA FOR t` result shape (reference: src/bql.py:236-252):
    * one row per column with (column, stattype, num_distinct, reason). */
  def guessSchema(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    guessStattypes(df)
      .map(g => (g.column, g.stattype.name, g.numDistinct, g.reason))
      .toDF("column", "stattype", "num_distinct", "reason")
  }
}
