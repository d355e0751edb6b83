package graft

import graft.sinks.WarehouseSink
import org.apache.spark.sql.functions._

class WarehouseSinkSpec extends SparkSpec {
  import spark.implicits._

  /** Drop the table AND its orphaned location (a fresh in-memory catalog
    * can't overwrite a directory left by a previous JVM).
    */
  private def reset(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val loc = new java.io.File(s"spark-warehouse/$n")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (loc.exists()) rm(loc)
  }

  test("bucketed tables join without a shuffle") {
    reset("wh_facts", "wh_dims")
    val facts = (1L to 1000L).map(i => (i % 50, s"f$i")).toDF("k", "payload")
    val dims = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "label")
    WarehouseSink.writeBucketed(facts, "wh_facts", "k", 8)
    WarehouseSink.writeBucketed(dims, "wh_dims", "k", 8)

    // disable broadcast so the join strategy decision is about shuffles
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = WarehouseSink.table(spark, "wh_facts")
        .join(WarehouseSink.table(spark, "wh_dims"), Seq("k"))
      assert(WarehouseSink.isShuffleFree(joined),
        joined.queryExecution.executedPlan.toString.take(500))
      assert(joined.count() == 1000L)

      // same join over plain (unbucketed) frames DOES shuffle
      val plain = facts.join(dims, Seq("k"))
      assert(!WarehouseSink.isShuffleFree(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned table prunes partitions on filter") {
    reset("wh_events")
    val events = Seq(("click", 1L), ("view", 2L), ("click", 3L))
      .toDF("event_type", "event_id")
    WarehouseSink.writePartitioned(events, "wh_events", Seq("event_type"))
    val filtered = WarehouseSink.table(spark, "wh_events")
      .filter(col("event_type") === "click")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("event_type"), scan.take(500))
    assert(filtered.count() == 2L)
  }

  test("dynamic partition pruning: the dim's filter prunes fact partitions") {
    reset("wh_fact_dpp", "wh_dim_dpp")
    // fact partitioned by day; the filter arrives only through a join
    // with a filtered dim — static pruning can't see it, DPP injects
    // the dim's build side as a runtime partition filter. At 100 TB
    // this is the difference between scanning one day and scanning
    // the table. The dim must be a real scan (a LocalRelation folds
    // the filter away and the pruning rule sees nothing selective).
    val fact = (1L to 2000L)
      .map(i => (i, (i % 20).toInt, s"v$i")).toDF("id", "day", "payload")
    WarehouseSink.writePartitioned(fact, "wh_fact_dpp", Seq("day"))
    (0 until 20).map(d => (d, if (d == 7) "hot" else "cold"))
      .toDF("day", "temp")
      .write.mode("overwrite").format("parquet").saveAsTable("wh_dim_dpp")
    val joined = WarehouseSink.table(spark, "wh_fact_dpp")
      .join(WarehouseSink.table(spark, "wh_dim_dpp")
        .filter(col("temp") === "hot"), Seq("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter:\n${plan.take(800)}")
    assert(joined.count() == 100L)
  }

  test("compaction rewrites a many-file table to few, same rows") {
    reset("wh_tiny_files", "wh_tiny_files_compacting")
    val df = (1L to 500L).map(i => (i, s"p$i")).toDF("id", "payload")
    df.repartition(50).write.format("parquet").saveAsTable("wh_tiny_files")
    def files(): Int =
      new java.io.File("spark-warehouse/wh_tiny_files")
        .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files() == 50)

    WarehouseSink.compact(spark, "wh_tiny_files", 4, sortCol = Some("id"))
    assert(files() == 4, "compaction must land the target file count")
    val back = spark.table("wh_tiny_files")
    assert(back.count() == 500L)
    assert(back.agg(sum("id")).head().getLong(0) == 500L * 501 / 2)
    // sortCol keeps min/max stats selective: a narrow id filter must
    // not read every file's rows (each file covers ~1/4 of the range)
    val spansOverlap = back
      .select(spark_partition_id().as("p"), col("id"))
      .groupBy("p").agg(min("id").as("lo"), max("id").as("hi"))
      .filter(col("lo") <= 10 && col("hi") >= 1).count()
    assert(spansOverlap == 1L,
      "only one compacted file should cover ids 1-10")
  }

  test("z-order layout keeps every file narrow on BOTH columns") {
    // two independent uniform dims; 16 output files. A sort by a
    // alone gives files spanning the FULL b range (a b-filter prunes
    // nothing); the Morton layout gives ~square tiles so both
    // per-file spans stay small.
    val n = 4096
    val df = (0 until n)
      .map { i => val h = (i * 2654435761L) & 0xffffffffL
        (i % 64, (h % 64).toInt, i) }
      .toDF("a", "b", "id")

    def spans(laid: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
      laid.select(spark_partition_id().as("p"), col("a"), col("b"))
        .groupBy("p")
        .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
        .collect().map(r => (r.getInt(1), r.getInt(2))).toSeq

    val z = spans(WarehouseSink.zorderLayout(df, "a", "b", 16, bits = 6))
    val bySingle = spans(df.repartitionByRange(16, col("a"))
      .sortWithinPartitions(col("a")))

    val zMaxB = z.map(_._2).max
    val singleMinB = bySingle.map(_._2).min
    assert(zMaxB < 32,
      s"z-order files must cover < half the b range, got spans $z")
    assert(singleMinB > 32,
      s"single-column layout should span most of b, got $bySingle")
    // and a stays reasonably tight too (square-ish tiles, not stripes)
    assert(z.map(_._1).max < 48, s"a spans too wide under z-order: $z")
  }
}
