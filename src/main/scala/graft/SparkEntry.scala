package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator from SURVEY §2's
  * inventory; [[oracleSql]] carries the DuckDB-dialect equivalent the driver
  * runs over the same parquet tables. Column names and types are aligned on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ DomainQueries.queries ++
      TextQueries.queries ++ EventQueries.queries ++ DeclaredQueries.queries ++
      ExtendedQueries.queries ++ GraphQueries.queries ++
      AssocQueries.queries ++ WarehouseQueries.queries ++
      TpchQueries.queries ++ EvalQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ DomainQueries.oracles ++
      TextQueries.oracles ++ EventQueries.oracles ++ DeclaredQueries.oracles ++
      ExtendedQueries.oracles ++ GraphQueries.oracles ++
      AssocQueries.oracles ++ WarehouseQueries.oracles ++
      TpchQueries.oracles ++ EvalQueries.oracles
}
