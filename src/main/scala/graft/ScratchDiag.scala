package graft

import graft.functions.{SamplingFunctions, TextFunctions}
import graft.operators.Decontam
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScratchDiag {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")
    docs.count()
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val n = body
      println(f"STAGE $tag%-12s ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    val nTok = TextFunctions.tokenCount(col("text"))
    val gated = docs
      .filter(TextFunctions.qualityScore(col("text")) >= 0.7 &&
        nTok.between(16, 90))
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    for (i <- 1 to 2) {
    time("gate")(gated.write.mode("overwrite").format("noop").save().asInstanceOf[AnyRef].hashCode().toLong)
    val winners = gated.groupBy(md5(col("text")).as("_d")).agg(min(col("doc_id")).as("doc_id"))
    val deduped = gated.join(winners.select(col("doc_id")).hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    time("dedup")(deduped.write.mode("overwrite").format("noop").save().asInstanceOf[AnyRef].hashCode().toLong)
    val labeled = deduped.withColumn("split",
      SamplingFunctions.splitLabel(SamplingFunctions.hashBucket(col("text"))))
    val idx = Decontam.buildIndex(labeled.filter(col("split") === "train"), "doc_id", "text")
    val leaky = Decontam.probe(idx, labeled.filter(col("split") =!= "train"), "doc_id", "text")
      .select(col("train_id").as("doc_id")).distinct()
    time("decontam")(leaky.write.mode("overwrite").format("noop").save().asInstanceOf[AnyRef].hashCode().toLong)
    val clean = labeled.join(leaky, Seq("doc_id"), "left_anti")
    val perLang = clean.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val grand = perLang.agg(sum(col("cnt")).as("total"), count(lit(1)).as("n_strata"))
    val rates = perLang.crossJoin(broadcast(grand))
      .select(col("lang"), least(lit(100L), expr("(total * 100) div (n_strata * cnt)")).as("rate_pct"))
    val full = clean
      .withColumn("mix_bucket", SamplingFunctions.hashBucket(reverse(col("text"))))
      .join(broadcast(rates), Seq("lang"))
      .filter(col("mix_bucket") < col("rate_pct"))
      .select(col("doc_id"), col("lang"), col("source"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"), col("split"))
    time("full")(full.write.mode("overwrite").format("noop").save().asInstanceOf[AnyRef].hashCode().toLong)
    }
    spark.stop()
  }
}
