package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checked queries. Each pack contributes
  * `queries` (name -> DataFrame program) and, for the SQL-expressible
  * subset, `oracleSql` (same name -> ANSI SQL DuckDB runs on the same
  * parquet tables). Column names and row order must agree between the
  * two — see SURVEY.md §5.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
