package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CatalogQueries, CubeQueries, LlmQueries, RdfQueries, RelationalQueries, ScalarQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to a
  * DataFrame plan over the parquet tables in `dir`; `oracleSql` holds the
  * equivalent DuckDB SQL (same column names — the driver compares by
  * name-sorted columns and value hashes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_join_agg_regional_revenue")(
      spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RdfQueries.queries ++ ScalarQueries.queries ++
      LlmQueries.queries ++ CubeQueries.queries ++ CatalogQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ RdfQueries.oracles ++ ScalarQueries.oracles ++
      LlmQueries.oracles ++ CubeQueries.oracles ++ CatalogQueries.oracles
}
