package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{LlmSurface, SqlSurface}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q3-shaped join+agg+topk — exercises scan, filter pushdown,
    * broadcast join, hash agg and TakeOrderedAndProject in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    SqlSurface.queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SqlSurface.queries ++ LlmSurface.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SqlSurface.oracles ++ LlmSurface.oracles
}
