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
}
