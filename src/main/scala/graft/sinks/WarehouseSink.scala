package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse-table sinks for co-located access patterns (SURVEY.md §2.b
  * "partitioning & shuffle"):
  *
  *  - `writePartitioned`: hive-style directory partitioning → partition
  *    PRUNING (a filter on the partition column skips whole directories;
  *    shows up as PartitionFilters in the scan).
  *  - `writeBucketed`: hash-bucketed table → co-located JOINS and
  *    aggregations (two tables bucketed by the same key join with ZERO
  *    exchanges; at 100 TB this removes the dominant shuffle from every
  *    fact-fact join on the bucket key).
  *
  * Both go through `saveAsTable` (bucket metadata lives in the catalog —
  * plain parquet files can't carry it).
  */
object WarehouseSink {

  def writePartitioned(df: DataFrame, table: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .partitionBy(partitionCols: _*)
      .format("parquet")
      .saveAsTable(table)

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
