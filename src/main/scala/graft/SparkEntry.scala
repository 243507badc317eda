package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories; each key is one operator
  * from SURVEY.md §2 (or a pipeline extension), each with a DuckDB oracle
  * where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship: BQL text through the parser + planner + Catalyst — the
    * product's front door. Driver smoke-checks rows>0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    operators.BqlQueries.b01Select(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.StatsQueries.queries ++
    operators.ModelQueries.queries ++
    operators.PipelineQueries.queries ++
    operators.BqlQueries.queries ++
    streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
    operators.StatsQueries.oracles ++
    operators.ModelQueries.oracles ++
    operators.PipelineQueries.oracles ++
    operators.BqlQueries.oracles ++
    streaming.StreamingQueries.oracles
}
