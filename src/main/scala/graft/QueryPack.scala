package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Each entry in `queries` is matched against `oracleSql` (ANSI SQL run by
  * DuckDB over the same parquet tables). Column names MUST match between the
  * Spark result and the oracle result — the driver sorts columns by name
  * before hashing values.
  *
  * Float discipline: anything that aggregates doubles goes through
  * DECIMAL(38,4) so the result is exact and independent of partitioning /
  * summation order, then is rounded and cast back to double identically on
  * both sides.
  */
trait QueryPack {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  /** DuckDB-runnable SQL per query; omit a key for rows-only checks. */
  def oracleSql: Map[String, String]
}
