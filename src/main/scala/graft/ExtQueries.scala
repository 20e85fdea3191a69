package graft

import org.apache.spark.sql.{DataFrame, SparkSession}


/** Extension-surface queries (SURVEY.md §2.12 / north-star): dedup,
  * similarity search, text analysis, window ops, JSON events. Merged into
  * [[SparkEntry.queries]]; every query has an exact DuckDB oracle built on
  * the shared md5 hash and IEEE-deterministic fold shapes. */
object ExtQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesText.queries ++ QueriesDedup.queries ++ QueriesSimilarity.queries ++ QueriesTemporal.queries ++
      QueriesCore.queries ++ QueriesProbes.queries ++ QueriesBinary.queries

  def oracleSql: Map[String, String] =
    QueriesText.oracleSql ++ QueriesDedup.oracleSql ++ QueriesSimilarity.oracleSql ++ QueriesTemporal.oracleSql ++
      QueriesCore.oracleSql ++ QueriesProbes.oracleSql ++ QueriesBinary.oracleSql
}
