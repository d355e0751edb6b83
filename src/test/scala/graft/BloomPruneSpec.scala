package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** Bloom-pruned joins: exact semantics (no false negatives + the real
  * join downstream), real pruning (fact rows drop before the shuffle),
  * tunable false-positive rate.
  */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val dim = (0L until 100L).map(i => (i * 7, s"d$i"))
      .toDF("k", "payload")
    val fact = (0L until 10000L).map(i => (i, i % 11))
      .toDF("fk", "grp")
    (fact, dim)
  }

  test("pruned join result equals the plain join exactly") {
    val (fact, dim) = fixture
    val pruned = BloomPrune.prunedEquiJoin(fact, dim, "fk", "k",
      expectedKeys = 100L)
      .select("fk", "payload").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    val plain = fact.join(dim, col("fk") === col("k"))
      .select("fk", "payload").collect().map(r =>
        (r.getLong(0), r.getString(1))).toSet
    assert(pruned == plain)
    assert(plain.size == 100) // multiples of 7 < 700
  }

  test("probe prunes most non-matching fact rows before the join") {
    val (fact, dim) = fixture
    val bloom = BloomPrune.build(dim, "k", expectedKeys = 100L,
      fpp = 0.01)
    val kept = fact.filter(
      BloomPrune.mightContain(bloom, col("fk"))).count()
    // 100 true keys; at 1% fpp the other ~9900 contribute ~99 FPs —
    // allow generous slack, the point is 10000 → ~hundreds
    assert(kept >= 100 && kept < 600, s"kept $kept of 10000")
  }

  test("mixed-width keys hash consistently (int fact key, bigint dim key)") {
    val dim = (0L until 100L).map(i => (i * 7, s"d$i")).toDF("k", "payload")
    val factInt = (0 until 10000).map(i => (i, i % 11)).toDF("fk", "grp")
    val pruned = BloomPrune.prunedEquiJoin(factInt, dim, "fk", "k",
      expectedKeys = 100L)
      .select("fk", "payload").collect().map(r =>
        (r.getInt(0), r.getString(1))).toSet
    assert(pruned.size == 100, "int-typed fact keys must still match")
  }

  test("outer/anti join types are rejected (pruning would drop kept rows)") {
    val (fact, dim) = fixture
    intercept[IllegalArgumentException] {
      BloomPrune.prunedEquiJoin(fact, dim, "fk", "k",
        expectedKeys = 100L, joinType = "left")
    }
    intercept[IllegalArgumentException] {
      BloomPrune.prunedEquiJoin(fact, dim, "fk", "k",
        expectedKeys = 100L, joinType = "left_anti")
    }
  }

  test("probe runs on an unbounded stream (stateless expression)") {
    // the use case prunedEquiJoin's doc claims: a pre-built key set
    // pruning a STREAMING fact source, where no runtime subquery exists
    implicit val sqlCtx = spark.sqlContext
    val (_, dim) = fixture
    val bloom = BloomPrune.build(dim, "k", expectedKeys = 100L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val pruned = input.toDF().toDF("fk")
      .filter(BloomPrune.mightContain(bloom, col("fk")))
    val q = pruned.writeStream.format("memory")
      .queryName("bloom_stream").outputMode("append").start()
    try {
      input.addData(0L until 1000L: _*)
      q.processAllAvailable()
      val kept = spark.table("bloom_stream").collect().map(_.getLong(0))
      val trueKeys = (0L until 100L).map(_ * 7).filter(_ < 1000L).toSet
      assert(trueKeys.subsetOf(kept.toSet)) // no false negatives
      assert(kept.length < 400) // and it actually pruned
    } finally q.stop()
  }

  test("no false negatives even when undersized") {
    val (fact, dim) = fixture
    // expectedKeys deliberately 10× too small → high fpp, never a miss
    val bloom = BloomPrune.build(dim, "k", expectedKeys = 10L)
    val keys = dim.select("k").as[Long].collect().toSet
    val kept = fact.filter(
      BloomPrune.mightContain(bloom, col("fk")))
      .select("fk").as[Long].collect().toSet
    assert(keys.filter(_ < 10000L).subsetOf(kept))
  }
}
