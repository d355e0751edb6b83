package graft

import graft.functions.SamplingFunctions
import org.apache.spark.sql.functions._

/** Content-hash sampling/splitting properties the curation queries
  * (d14–d16, d19) and the decontamination query (d20) rely on.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "jumps over the lazy dog"),
    (2L, "the quick brown fox"), // exact dup of 0
    (3L, "pack my box with five dozen jugs"),
    (4L, "jumps over the lazy dog") // exact dup of 1
  ).toDF("doc_id", "text")

  test("buckets are deterministic and in [0, 100)") {
    def run() = docs.select(col("doc_id"),
      SamplingFunctions.hashBucket(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(); val b = run()
    assert(a == b)
    assert(a.values.forall(v => v >= 0 && v < 100))
  }

  test("exact duplicates can NEVER cross a content-hash split") {
    // identical content ⇒ identical bucket ⇒ identical split: the
    // leak-free-by-construction property d15/d20 are built on
    val splits = docs.select(col("text"),
      SamplingFunctions.splitLabel(
        SamplingFunctions.hashBucket(col("text"))).as("split"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val byText = splits.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byText.values.forall(_.size == 1),
      "same text must always land in the same split")
  }

  test("splitLabel respects the 80/10/10 thresholds") {
    val labeled = spark.range(0, 100).toDF("b")
      .select(col("b"), SamplingFunctions.splitLabel(col("b")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L until 80L).forall(labeled(_) == "train"))
    assert((80L until 90L).forall(labeled(_) == "val"))
    assert((90L until 100L).forall(labeled(_) == "test"))
  }
}
