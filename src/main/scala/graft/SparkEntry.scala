package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Registry => QueryRegistry}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query surface from the
  * per-domain registries under `graft.queries`. Each entry is a
  * [[GraftQuery]]: a DataFrame builder over a testdata dir plus (where
  * SQL-expressible) an equivalent DuckDB oracle with identical column
  * names — the driver hash-compares columns by name.
  */
object SparkEntry {

  /** Every registered query, in registry order. */
  def registry: Seq[GraftQuery] = QueryRegistry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryRegistry.flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
