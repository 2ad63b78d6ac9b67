package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{MqlQueries, PipelineQueries, RelationalQueries, StreamingQueries, WritePathQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2 plus
  * the LLM-pipeline extensions; `oracleSql` supplies the DuckDB twin for
  * each (omitted only for ops DuckDB cannot express — driver falls back to
  * a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.all("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ MqlQueries.all ++ PipelineQueries.all ++
      StreamingQueries.all ++ WritePathQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ MqlQueries.oracles ++ PipelineQueries.oracles ++
      StreamingQueries.oracles ++ WritePathQueries.oracles
}
