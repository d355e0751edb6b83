package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def large = Seq(
    (1L, "a1"), (1L, "a2"), (1L, "a3"), (2L, "b1"), (3L, "c1"))
    .toDF("k", "payload")
  private def small = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4"))
    .toDF("k", "label")

  test("salted join equals plain join") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(large, small, "k", saltFactor = 4)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 4) // 3 rows for k=1, 1 for k=2, none for 3/4
  }

  test("selective salting equals plain join") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val sel = SkewJoin.saltedJoinSelective(large, small, "k",
      skewedKeys = Seq(1L), saltFactor = 4)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(sel == plain)
  }

  test("salt spreads a hot key over multiple salt values") {
    val hot = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = hot.withColumn("_salt",
      pmod(xxhash64(struct(hot.columns.map(col).toSeq: _*)), lit(8))
        .cast("int"))
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(salts == 8L)
  }

  test("salting spreads a hot key's rows across shuffle partitions") {
    // the 100×-scale property itself: repartitioned by the bare key,
    // every hot-key row lands in ONE reducer; by (key, salt) they
    // spread over many — measured with spark_partition_id, not inferred
    val hot = (1 to 4000).map(i => (1L, s"row$i")) ++
      (1 to 40).map(i => (100L + i, s"cold$i"))
    val df = hot.toDF("k", "payload")
    def hotPartitions(d: org.apache.spark.sql.DataFrame,
                      cols: Seq[String]): Long =
      d.repartition(8, cols.map(col): _*)
        .withColumn("_pid", spark_partition_id())
        .filter(col("k") === 1L)
        .select(countDistinct(col("_pid"))).collect()(0).getLong(0)
    val plain = hotPartitions(df, Seq("k"))
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(8))
        .cast("int"))
    val spread = hotPartitions(salted, Seq("k", "_salt"))
    assert(plain == 1L, s"bare key must collapse to one reducer, got $plain")
    // 8 (key, salt) combos hash into 8 reducers with collisions —
    // expected distinct ≈ 8·(1−(7/8)⁸) ≈ 5; the property under test is
    // one-reducer vs many, not a perfect spread
    assert(spread >= 4L, s"salted key should spread reducers, got $spread")
  }

  test("AQE OptimizeSkewedJoin splits a manufactured hot key at runtime") {
    // the first line of defense the operator scaladoc defers to:
    // lowered thresholds + a 90%-hot-key fact side force the runtime
    // re-plan, visible in the final adaptive plan as a skew=true join
    // over a skewed AQEShuffleRead
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      val left = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit("payload_payload_payload_payload_"), col("id"))
          .as("payload"))
      val right = spark.range(0, 200000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("label"))
      val joined = left.join(right, "k")
      assert(joined.collect().length == 200000) // every row matches once

      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), "AQE must finalize the plan")
      assert(p.contains("skew=true"),
        s"join must be re-planned as a skew join:\n${p.take(600)}")
      assert(p.contains("AQEShuffleRead skewed"),
        "the hot side's shuffle read must be split")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
