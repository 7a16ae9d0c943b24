package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GraftSession
import graft.warehouse.{AnalyticsQueries, ExtendedQueries, IotQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates one entry per implemented operator from
  * SURVEY.md §2 (plus the LLM-pipeline extensions); `oracleSql` carries
  * the DuckDB-equivalent SQL for the driver's hash-compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    RelationalQueries.leaderboard(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExtendedQueries.queries ++ IotQueries.queries ++
      PipelineQueries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ ExtendedQueries.oracle ++ IotQueries.oracle ++
      PipelineQueries.oracle ++ AnalyticsQueries.oracle
}
