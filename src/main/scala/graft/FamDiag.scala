package graft

import graft.operators.CdcDedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage attribution for the d50/d51 sf3 wall blow-ups found by
  * the r11 third-decade sweep ([[Diag]] family — not driver contract).
  * Materializes each phase of the suspect query separately and prints
  * the ADAPTIVE final plan of the slow composite, so the 38× wall at
  * 3× data can be attributed to a stage instead of argued.
  */
object FamDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf1")
    val which = if (args.length > 1) args(1) else "d50"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"phase $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.load(spark, dir, "documents")

    which match {
      case "d50" =>
        val arrivals = docs.filter(col("source") === "src0")
        val reference = docs.filter(col("source") =!= "src0")
        timed("segments(arrivals)")(noop(
          CdcDedup.segments(arrivals, "doc_id", "text", 16)))
        timed("segments(reference)")(noop(
          CdcDedup.segments(reference, "doc_id", "text", 16)))
        val index = CdcDedup.segmentIndex(reference, "doc_id", "text", 16)
        timed("index distinct")(noop(index))
        val full = CdcDedup.scrubSegments(arrivals, "doc_id", "text",
          index, 16)
        timed("full scrub")(noop(full))
        println(full.queryExecution.executedPlan.toString.take(12000))
      case "mass" =>
        // ground truth for the d44/d46 byte-scaling question: how does
        // the corpus's REPEATED-gram mass (the pass-2 shuffle driver)
        // actually scale? (occurrence-counted, hash-level — exactly
        // what repeatedHashPositions keeps)
        val g = docs.filter(length(col("text")) >= 40)
          .select(col("doc_id").as("_id"),
            explode(transform(
              sequence(lit(1), length(col("text")) - 39),
              p => xxhash64(col("text").substr(p, lit(40))))).as("_gh"))
        val dup = g.groupBy(col("_gh")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
        val total = timed("total positions")(g.count())
        val stats = timed("dup hash stats")(
          dup.agg(count(lit(1)), sum(col("c")), max(col("c"))).head())
        println(s"total=$total dupHashes=${stats.getLong(0)} " +
          s"dupMass=${stats.getLong(1)} maxOcc=${stats.getLong(2)}")
      case _ =>
        val q = SparkEntry.queries("d51_curation_pipeline")
        val df = q(spark, dir)
        timed("full d51")(noop(df))
        println(df.queryExecution.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
