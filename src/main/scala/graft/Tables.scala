package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver test data (TESTDATA.md).
  *
  * The reference discovers sources by globbing a directory
  * (`import_sirene.py:187-196`); here the driver hands us the directory and
  * table names are fixed, so the loader is a plain path join. Filters and
  * column pruning applied downstream reach the parquet scan via Catalyst
  * (PushedFilters / ReadSchema) — nothing to hand-roll.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache: every query calls load() 1-3×, and each uncached
  // spark.read.parquet lists the path and reads footers to infer the
  // schema — pure fixed cost repeated ~200× across the query set. The
  // data itself is NOT cached (scans stay lazy/pushdown-friendly);
  // only the inferred StructType is reused.
  //
  // ASSUMES the benchmark layout is immutable within a JVM (it is:
  // /root/testdata is read-only). If a dataset at a cached path were
  // regenerated with a different schema, reads would silently miscast —
  // key by path+footer fingerprint before reusing this loader on
  // mutable paths (ADVICE r2).
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark
      .sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      // events.ts has shipped in two physical layouts across driver
      // generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
      // rejects — read nanos as long, truncate to micros with integer
      // division; a double division would lose precision at ~1.7e18 ns)
      // and plain TIMESTAMP/NTZ micros. Branch on the footer type so
      // both load identically; DuckDB oracles use CAST(ts AS TIMESTAMP),
      // which agrees with each branch (sessions run UTC).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = schemaCache.getOrElseUpdate(path,
        spark.read.parquet(path).schema)
      val raw = spark.read.schema(schema).parquet(path)
      schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType =>
          // unix_micros & friends need TimestampType; UTC session makes
          // the reinterpretation value-identical to the NTZ wall clock.
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else {
      val schema = schemaCache.getOrElseUpdate(path,
        spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }
}
