package graft

import org.apache.spark.sql.functions._

/** Semantic sanity for the round-3 SQL-surface operators (the oracle
  * gate checks values; these assert the operator CONTRACTS hold).
  */
class Relational4Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  test("lateral top-k returns at most 3 customers per nation, ordered") {
    val rows = q("q31_lateral_topk")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n"), max(col("c_acctbal")).as("mx"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) <= 3))
  }

  test("recursive chain: depth bounded at 6, totals monotone per chain") {
    val df = q("q32_recursive_chain").cache()
    try {
      assert(df.agg(max(col("depth"))).head().getInt(0) <= 6)
      // run_total strictly increases along each customer's chain
      // (o_totalprice > 0), so max(depth) rows carry the chain max
      val bad = df.groupBy(col("o_custkey"))
        .agg(max(col("depth")).as("d"),
          count(lit(1)).as("n"),
          min(col("run_total")).as("lo"),
          max(col("run_total")).as("hi"))
        .filter(col("n") =!= col("d") || col("hi") < col("lo"))
        .count()
      assert(bad == 0, "each chain must have one row per depth 1..d")
    } finally df.unpersist()
  }

  test("null-safe join pairs the NULL groups instead of dropping them") {
    val rows = q("q33_null_safe_join").collect()
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length == 1, "exactly one NULL-key row")
    assert(!nullRow.head.isNullAt(1) && !nullRow.head.isNullAt(2),
      "NULL groups from both sides must meet in one row")
  }

  test("activity islands partition each user's days exactly") {
    val islands = q("e05_activity_islands")
    val users = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
    val joined = islands.join(users, Seq("user_id"))
    assert(joined.filter(col("longest") > col("n_days")).count() == 0)
    assert(joined.filter(col("n_islands") > col("n_days")).count() == 0)
  }
}
