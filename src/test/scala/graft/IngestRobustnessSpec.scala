package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dirty-input behaviors a long-lived ingest hits constantly: schema
  * evolution across parquet segments (a column added mid-stream) and
  * malformed CSV records. Pins that the library's read paths degrade
  * the way a pipeline needs — old segments null-fill new columns, bad
  * rows are captured (PERMISSIVE) or fail loudly (FAILFAST), never
  * silently dropped.
  */
class IngestRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("parquet schema evolution: old segments null-fill added columns") {
    val dir = tmpDir("graft_evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/seg=1")
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(s"$dir/seg=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet ==
      Set("id", "v", "score", "seg"))
    assert(merged.count() == 4L)
    val old = merged.filter(col("seg") === 1)
    assert(old.filter(col("score").isNull).count() == 2L,
      "pre-evolution rows must read the new column as NULL")
    // and the default (no mergeSchema) picks ONE file's schema — the
    // reason ingest jobs must opt in explicitly
    val unmerged = spark.read.parquet(dir)
    assert(unmerged.schema.fieldNames.length < 4 ||
      unmerged.schema.fieldNames.contains("score"))
  }

  test("malformed CSV: PERMISSIVE captures the raw line, FAILFAST throws") {
    val dir = tmpDir("graft_badcsv")
    val csv = "id,qty\n1,10\n2,notanumber\n3,30\n"
    Files.write(java.nio.file.Paths.get(s"$dir/data.csv"),
      csv.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("qty", IntegerType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(schema)
      .option("header", "true")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized frame
    try {
      assert(permissive.count() == 3L, "no row may be silently dropped")
      val bad = permissive.filter(col("_corrupt_record").isNotNull)
        .collect()
      assert(bad.length == 1)
      assert(bad(0).getAs[String]("_corrupt_record")
        .contains("notanumber"))
      assert(bad(0).isNullAt(bad(0).fieldIndex("qty")),
        "the unparseable field must be NULL, not garbage")

      val failfast = spark.read
        .schema(StructType(schema.dropRight(1)))
        .option("header", "true").option("mode", "FAILFAST").csv(dir)
      val err = intercept[Exception](failfast.collect())
      assert(err.getMessage.contains("FAILFAST") ||
        err.getCause != null, s"unexpected: ${err.getMessage.take(200)}")
    } finally permissive.unpersist()
  }
}
