package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized in [[QueryPack]]s; each pack pairs Spark
  * DataFrame implementations with DuckDB oracle SQL over the same parquet
  * tables (TESTDATA.md).
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    graft.queries.Relational,
    graft.queries.ReferenceOps,
    graft.queries.EventTime,
    graft.queries.TrainingOps,
    graft.queries.Relational2,
    graft.queries.Relational3,
    graft.queries.Relational4,
    graft.queries.TrainingOps2,
    graft.queries.Analytics,
    graft.queries.SubstrOps,
    graft.queries.Curation,
    graft.queries.QualityOps)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.queries("q02_revenue_by_region")(
      spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap
}
