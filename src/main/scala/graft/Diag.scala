package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc scale diagnostics (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val sk = Dedup.simhashSketches(docs, "doc_id", "text")
      .withColumn("bucket", shiftrightunsigned(col("sketch"), 64 - 8))
    sk.groupBy("bucket").count().orderBy(desc("count")).show(5)
    val t0 = System.nanoTime()
    println("sketch count: " + sk.count() +
      " in " + (System.nanoTime()-t0)/1e9 + "s")
    val t1 = System.nanoTime()
    println("d07 pairs: " + Dedup.simhashPairs(docs, "doc_id", "text",
      16, 8).count() + " in " + (System.nanoTime()-t1)/1e9 + "s")
    val t15 = System.nanoTime()
    println("d06 sigs only: " + Dedup.minhashSignatures(docs, "doc_id",
      "text", 3, 64).count() + " in " + (System.nanoTime()-t15)/1e9 + "s")
    val t16 = System.nanoTime()
    println("shingles only: " + docs.select(org.apache.spark.sql.functions
      .explode(graft.functions.TextFunctions.wordShingles(col("text"), 3)))
      .count() + " in " + (System.nanoTime()-t16)/1e9 + "s")
    val t2 = System.nanoTime()
    println("d06 pairs: " + Dedup.minhashLshPairs(docs, "doc_id", "text",
      3, 16, 4, 0.3).count() + " in " + (System.nanoTime()-t2)/1e9 + "s")
    spark.stop()
  }
}
