package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Zipped single-entry text sources (S2 in SURVEY.md §2.a).
  *
  * Spark has no native `.zip` codec. The reference streams the first zip
  * entry (`/root/reference/datagouv_tools/import_sirene.py:331-352`); here
  * each zip becomes one `binaryFile` row and a `flatMap` inflates its
  * first entry into lines on an executor.
  *
  * Scale note: a zip entry is non-splittable, so one file = one task. At
  * 100 TB the unit of parallelism is the *file count* (SIRENE ships many
  * zips) — each executor core inflates its own zip concurrently. For a
  * single giant zip, pre-extract to a splittable format first; this
  * mirrors the reference's own temp-file spill strategy
  * (`generic.py:240-255`).
  */
object ZipCsv {

  /** Lines of the first entry of each zip under `path`. */
  def readLines(spark: SparkSession, path: String,
                charset: String = "UTF-8"): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val zin = new ZipInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val entry = zin.getNextEntry
        if (entry == null) Iterator.empty
        else {
          val reader = new BufferedReader(
            new InputStreamReader(zin, charset))
          Iterator.continually(reader.readLine()).takeWhile(_ != null)
        }
      }
  }

  /** Parse the zipped CSV with a header row into a DataFrame (unix
    * dialect: `,` delimiter, `"` quote).
    */
  def readCsv(spark: SparkSession, path: String,
              charset: String = "UTF-8"): DataFrame = {
    val lines = readLines(spark, path, charset)
    spark.read
      .option("header", "true")
      .option("delimiter", ",")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(lines)
  }
}
