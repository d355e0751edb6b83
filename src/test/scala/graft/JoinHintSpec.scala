package graft

import org.apache.spark.sql.functions._

/** Join-strategy hints are the operational tuning levers at scale — a
  * misestimated dim that won't broadcast, a skewed SMJ that should
  * shuffle-hash. This pins that each hint actually lands in the
  * physical plan (and that the default differs), so the levers
  * documented in ARCHITECTURE.md §4 stay real.
  */
class JoinHintSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "v")
  private def dim = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "label")

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast hint forces BHJ even with broadcast disabled by conf") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val unhinted = fact.join(dim, Seq("k"))
      assert(!planOf(unhinted).contains("BroadcastHashJoin"),
        "with the threshold off, the default must not broadcast")
      val hinted = fact.join(broadcast(dim), Seq("k"))
      assert(planOf(hinted).contains("BroadcastHashJoin"),
        "the broadcast hint must override the conf")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("merge and shuffle_hash hints pick SMJ and SHJ respectively") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smj = fact.hint("merge").join(dim.hint("merge"), Seq("k"))
      assert(planOf(smj).contains("SortMergeJoin"), planOf(smj).take(300))
      val shj = fact.join(dim.hint("shuffle_hash"), Seq("k"))
      assert(planOf(shj).contains("ShuffledHashJoin"),
        planOf(shj).take(300))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
