package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) clustering layout over two numeric columns, for
    * multi-column scan pruning: each column range-buckets to `bits`
    * bits (bounds from one (min,max) pass, broadcast back — no driver
    * state), the buckets' bits interleave into a Morton code, and the
    * frame range-repartitions + locally sorts on it. Every output
    * file then covers a tight ~square of the (a, b) value space, so
    * min/max stats prune scans filtered on EITHER column — a sort by
    * `a` alone leaves every file spanning the full `b` range and a
    * b-filter reads everything. This is the OPTIMIZE ZORDER layout
    * pass, expressed as pure Spark (interleave is codegen'd integer
    * bit ops; the only wide op is the range exchange a write needs
    * anyway).
    */
  def zorderLayout(df: DataFrame, colA: String, colB: String,
                   numFiles: Int, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    val stats = broadcast(df.agg(
      min(col(colA)).cast("double").as("_loa"),
      max(col(colA)).cast("double").as("_hia"),
      min(col(colB)).cast("double").as("_lob"),
      max(col(colB)).cast("double").as("_hib")).localCheckpoint(true))
    val nb = 1 << bits
    def bucket(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0)).otherwise(
        least(floor((c.cast("double") - lo) / ((hi - lo) / nb))
          .cast("int"), lit(nb - 1)))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(col("_ba"), i)
          .bitwiseAND(lit(1)).cast("long"), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(col("_bb"), i)
          .bitwiseAND(lit(1)).cast("long"), 2 * i))
    }
    df.crossJoin(stats)
      .withColumn("_ba", bucket(col(colA), col("_loa"), col("_hia")))
      .withColumn("_bb", bucket(col(colB), col("_lob"), col("_hib")))
      .withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_loa", "_hia", "_lob", "_hib", "_ba", "_bb", "_z")
  }

  /** Small-files compaction for an unpartitioned managed table: rewrite
    * to `numFiles` files via a staging table, then swap via catalog
    * renames (a table cannot be overwritten while it is being read).
    * `sortCol`, when given, locally sorts each output file so min/max
    * stats stay selective after the rewrite — pass a Morton column via
    * [[zorderLayout]] upstream for the 2-D variant. At 100 TB the
    * streaming-ingest → thousands-of-tiny-files → compact cycle is
    * routine maintenance; the rewrite cost is one range exchange.
    *
    * Crash safety: the swap renames the old table ASIDE before promoting
    * the staging copy (never DROP-then-RENAME), so at every instant at
    * least one complete copy of the data exists under a known name. A
    * re-run after a crash inside the swap window finds staging present
    * with the source gone and PROMOTES the staging copy instead of
    * clobbering the only remaining data.
    */
  def compact(spark: SparkSession, table: String, numFiles: Int,
              sortCol: Option[String] = None): Unit = {
    val staging = table + "_compacting"
    val retired = table + "_compacted_old"
    if (spark.catalog.tableExists(staging) &&
        !spark.catalog.tableExists(table)) {
      // a previous run crashed between rename-aside and promote: the
      // staging table holds the only live copy — recover it, then let
      // the compaction below run against the recovered table
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    }
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    val df = spark.table(table)
    val laid = sortCol match {
      case Some(c) => df.repartitionByRange(numFiles, col(c))
        .sortWithinPartitions(col(c))
      case None => df.repartition(numFiles)
    }
    laid.write.format("parquet").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS $retired")
    spark.sql(s"ALTER TABLE $table RENAME TO $retired")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    spark.sql(s"DROP TABLE $retired")
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed joins buy.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
