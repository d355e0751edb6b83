package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes a ~sf1 dataset from the driver's sf0.1 parquet by unioning
  * k key-shifted copies — the empirical scale-up probe (VERDICT r7 Next #1).
  *
  * Design constraints, in order of importance:
  *
  *  1. '''Same distribution, k× the volume.''' Every copy shifts its keys by
  *     `copy_index × stride` (stride = max key + 1, computed once from the
  *     source), so join fan-outs, group cardinalities, and cluster sizes are
  *     preserved per copy while totals scale linearly. `nation`/`region`
  *     stay unscaled — they are the broadcast dims at any scale, exactly as
  *     TPC-H itself keeps nation/region constant across SFs.
  *  2. '''No cross-copy near-duplicates.''' A verbatim text copy would make
  *     every dup-cluster k× larger → candidate pairs grow k², turning the
  *     dedup family's measurement quadratic BY CONSTRUCTION rather than by
  *     plan defect. Instead each copy's `documents.text` goes through a
  *     bijective character substitution (`translate` over the 10 most
  *     frequent letters in both cases plus the 10 digits, each class
  *     rotated within itself by copy index): token boundaries, lengths,
  *     and intra-copy equality/similarity are preserved exactly, while any
  *     cross-copy word 3-gram overlap requires three consecutive tokens
  *     containing no substituted letter and no digit — rare enough that
  *     copies are disjoint corpora.
  *  3. '''Deterministic.''' No RNG anywhere; re-running produces
  *     byte-identical rows (modulo parquet file split), so scale-bench
  *     numbers are reproducible across sessions.
  *
  * events.ts is parquet TIMESTAMP(NANOS); it is read as raw long
  * (`nanosAsLong`, the Tables.load convention) and written back as long —
  * Tables.load on the output applies the same micros truncation it applies
  * to the driver's own files.
  */
object ScaleUp {
  /** The substitution alphabets: 10 highest-frequency English letters
    * (both cases) and the 10 digits, each class rotating WITHIN itself
    * by the copy index — k distinct bijections (identity for copy 0),
    * each preserving string length, token structure, and character
    * class (letter stays letter, digit stays digit, case preserved).
    * Digits and uppercase are included because the first sf1 build
    * rotated lowercase only and d36 found 55 cross-copy "near-dup"
    * pairs — short docs whose word-3-grams were digit/punctuation-only
    * and thus substitution-invariant (STATUS r8 honest note).
    */
  private val Alphas = Seq("etaoinsrhl", "ETAOINSRHL", "0123456789")

  private def rotated(i: Int): (String, String) = {
    val from = Alphas.mkString
    val to = Alphas.map { a =>
      val r = i % a.length
      a.substring(r) + a.substring(0, r)
    }.mkString
    (from, to)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/scale/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, k)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, k: Int): Unit = {
    // the rotation alphabets have period 10: copy 10 would reuse copy
    // 0's identity substitution and reintroduce exact cross-copy
    // duplicates — the construction defect this tool exists to avoid
    require(k >= 1 && k <= Alphas.head.length,
      s"k=$k outside [1, ${Alphas.head.length}]: only " +
        s"${Alphas.head.length} distinct substitutions exist before the " +
        "rotation repeats and copies stop being disjoint")
    def tbl(name: String): DataFrame = Tables.load(spark, src, name)
    // stride per key family = max + 1, so shifted ranges never collide.
    // One tiny driver-side aggregate per family — bounded metadata, the
    // Sampling.collectSample discipline.
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val ordS = stride(tbl("orders"), "o_orderkey")
    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val docS = stride(tbl("documents"), "doc_id")
    val vecS = stride(tbl("embeddings"), "vec_id")
    val evS = stride(tbl("events"), "event_id")
    val userS = stride(tbl("events"), "user_id")

    /** Union k copies of `df`, transforming copy i with `shift(df, i)`.
      * Copy 0 is always the identity (shift receives i=0 and must behave
      * as such — the `translate`/`+ 0` forms below do).
      */
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => shift(df, i)).reduce(_ unionAll _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"scaleup: wrote $name")
    }

    // dims that stay constant across SFs (broadcast side at any scale)
    write(tbl("region"), "region")
    write(tbl("nation"), "nation")

    write(copies(tbl("customer")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * custS))
        .withColumn("c_name",
          when(lit(i) === 0, col("c_name"))
            .otherwise(concat(col("c_name"), lit("#" + "%02d".format(i)))))
    }, "customer")

    write(copies(tbl("supplier")) { (df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * suppS))
        .withColumn("s_name",
          when(lit(i) === 0, col("s_name"))
            .otherwise(concat(col("s_name"), lit("#" + "%02d".format(i)))))
    }, "supplier")

    write(copies(tbl("part")) { (df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * partS))
    }, "part")

    write(copies(tbl("orders")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * ordS))
        .withColumn("o_custkey", col("o_custkey") + lit(i * custS))
    }, "orders")

    write(copies(tbl("lineitem")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * ordS))
        .withColumn("l_partkey", col("l_partkey") + lit(i * partS))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * suppS))
    }, "lineitem")

    // events: ts is raw nanos (long) after Tables.load normalization was
    // NOT applied — re-read without the micros cast so the written file
    // round-trips through Tables.load identically to the driver's own.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawEvents = spark.read.parquet(s"$src/events.parquet")
    write(copies(rawEvents) { (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * evS))
        .withColumn("user_id", col("user_id") + lit(i * userS))
    }, "events")

    write(copies(tbl("documents")) { (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * docS))
        .withColumn("text",
          if (i == 0) col("text")
          else {
            val (from, to) = rotated(i)
            translate(col("text"), from, to)
          })
    }, "documents")

    write(copies(tbl("embeddings")) { (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * vecS))
        // rotate the vector by i positions: preserves the norm and the
        // pairwise-distance distribution within a copy, decorrelates
        // cross-copy neighbors — same trick as the text bijection.
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else concat(slice(col("embedding"), i + 1, 100000),
            slice(col("embedding"), 1, i)))
    }, "embeddings")
  }
}
