package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * SURVEY.md §7.2: the minimum end-to-end slice is the lineitem summary
    * aggregate — projection + group-aggregate with partial (map-side)
    * aggregation, whole-stage codegen throughout.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q11_lineitem_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ PipelineQueries.oracleSql

  /** Production-plan overrides for the [[queries]] entries that run an
    * exact twin in-query as their driver-visible correctness payload
    * (the round-11 banded-claim convention: s03/s04/s09/s11/s13 carry a
    * brute-force ranking, d04/d05/d14 the exact pair enumeration, p21
    * the exact broadcast verdict). At 100 TB only these plans ship, so
    * [[Bench]] times them as the headline and prices the full oracle
    * forms separately (`oracle_forms` / `twin_overhead`); [[Verify]] and
    * the driver's correctness gate keep reading [[queries]]. */
  def productionQueries: Map[String, (SparkSession, String) => DataFrame] =
    PipelineQueries.productionOverrides
}
