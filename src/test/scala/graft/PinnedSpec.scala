package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.RDDScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.{col, sum}

/** Pinned.byKey / CheckpointBridge contract: the pinned relation
  * REPORTS the HashPartitioning the repartition just produced, so
  * keyed consumers reuse it with no exchange — including when the
  * caller spells the key with different CASE than the schema (ADVICE
  * r16: the bridge must resolve keys from the repartition's own
  * analyzed partition expressions, not re-resolve names
  * case-sensitively after the shuffle already resolved them
  * case-insensitively).
  */
class PinnedSpec extends SparkSpec {
  import spark.implicits._

  private def assertNoExchangeAboveScan(df: DataFrame): Unit = {
    // restore the PRIOR value, not a hard-coded "true" (ADVICE r17:
    // a literal restore silently flips session config for any suite
    // running with AQE disabled)
    val prior = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = df.queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      val scansUnderExchange = exchanges.flatMap(
        _.collect { case r: RDDScanExec => r })
      assert(scansUnderExchange.isEmpty,
        "the pinned relation must not re-exchange:\n" +
          plan.treeString.take(2000))
      assert(plan.collect { case r: RDDScanExec => r }.nonEmpty,
        "the pinned relation must appear in the plan")
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("a keyed aggregation over the pinned frame plans zero exchanges") {
    val pinned = Pinned.byKey(
      Seq((1L, 10L), (2L, 20L), (1L, 30L)).toDF("k", "v"), 4, "k")
    assertNoExchangeAboveScan(pinned.groupBy(col("k")).agg(sum("v")))
  }

  test("differently-cased keys resolve exactly as the repartition did " +
      "(ADVICE r16) — and the reported partitioning matches the data") {
    // pre-fix: repartition resolved 'K' -> k case-insensitively and
    // shuffled, then the bridge's exact-name lookup threw — the caller
    // paid the full shuffle+checkpoint for an error
    val pinned = Pinned.byKey(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "d")).toDF("k", "v"),
      4, "K")
    // the claimed partitioning is consumed with no exchange...
    assertNoExchangeAboveScan(pinned.groupBy(col("k")).count())
    // ...and it is TRUE: grouping without a shuffle still partitions
    // the key space exactly (a false claim would drop or double rows)
    assert(pinned.groupBy(col("k")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
    assert(pinned.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 1L, 2L, 3L))
  }

  test("an unknown key still fails, now at analysis time inside " +
      "repartition") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      Pinned.byKey(df, 4, "nope")
    }
  }
}
