package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window aggregates a memory stream incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val query = EventStreams.tumblingCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0),
        (ts(6), "view", 5.0))
      query.processAllAvailable()
      val out = spark.table("tumbling_test")
        .orderBy("window_start", "event_type")
        .collect()
      assert(out.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq == Seq(
        (ts(0), "click", 2L, 3.0),
        (ts(5), "view", 1L, 5.0)))
    } finally query.stop()
  }

  test("sliding window counts each event in overlapping buckets") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val events = input.toDF().toDF("ts", "value")
    val query = EventStreams.slidingCounts(events, "10 minutes",
      "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((ts(7), 2.0)) // lands in [10:00,10:10) and [10:05,10:15)
      query.processAllAvailable()
      val starts = spark.table("sliding_test")
        .orderBy("window_start").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toSeq
      assert(starts == Seq(ts(0) -> 1L, ts(5) -> 1L))
    } finally query.stop()
  }

  test("session window merges events within the gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")

    // session-window aggregation only supports append/complete output
    val query = EventStreams.sessionCounts(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("session_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      // user 1: 10:00, 10:05 (same session), 10:40 (new session)
      input.addData((ts(0), 1L), (ts(5), 1L), (ts(40), 1L))
      query.processAllAvailable()
      val out = spark.table("session_test")
        .filter(col("user_id") === 1)
        .orderBy("session_start").collect()
      assert(out.length == 2)
      assert(out(0).getLong(3) == 2L)
      assert(out(1).getLong(3) == 1L)
    } finally query.stop()
  }

  test("mapGroupsWithState keeps running totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.EventRow]
    val query = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("state_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(EventStreams.EventRow(1L, ts(0), 10.0),
        EventStreams.EventRow(1L, ts(1), 5.0))
      query.processAllAvailable()
      input.addData(EventStreams.EventRow(1L, ts(2), 1.0))
      query.processAllAvailable()
      val out = spark.table("state_test")
        .groupBy("user_id").agg(max("n_events").as("n"),
          max("total_value").as("t")).collect()
      assert(out.head.getLong(1) == 3L)
      assert(out.head.getDouble(2) == 16.0)
    } finally query.stop()
  }

  test("stream-static broadcast join enriches events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("uid", "name")

    val query = EventStreams.enrichedEvents(events, dim, "user_id", "uid")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L), (ts(1), 3L))
      query.processAllAvailable()
      val out = spark.table("enrich_test").orderBy("ts").collect()
      assert(out(0).getAs[String]("name") == "alice")
      assert(out(1).isNullAt(out(1).fieldIndex("name"))) // unmatched → null
    } finally query.stop()
  }

  test("stream-stream interval join attributes purchases to clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val joined = EventStreams.attributePurchases(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "value"))

    val query = joined.writeStream.format("memory")
      .queryName("attribution_test")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L))
      purchases.addData((ts(5), 1L, 99.0), // within 10 min of user 1 click
        (ts(30), 2L, 10.0)) // outside the window
      query.processAllAvailable()
      val out = spark.table("attribution_test").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Long]("user_id") == 1L)
      assert(out(0).getAs[Double]("purchase_value") == 99.0)
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER join emits orphans only after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Double)]
    val joined = EventStreams.attributePurchases(
      clicks.toDF().toDF("ts", "user_id"),
      purchases.toDF().toDF("ts", "user_id", "value"),
      joinType = "left_outer")
    val query = joined.writeStream.format("memory")
      .queryName("attribution_outer_test")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(0), 1L))
      purchases.addData((ts(5), 1L, 99.0), (ts(5), 3L, 55.0))
      query.processAllAvailable()
      val early = spark.table("attribution_outer_test").collect()
      assert(early.count(_.getAs[Long]("user_id") == 1L) == 1,
        "inner matches must stream out immediately")
      assert(!early.exists(_.getAs[Long]("user_id") == 3L),
        "the orphan must WAIT for the watermark — a late click could " +
          "still attribute it")
      // push event time far past the match window; the watermark takes
      // effect on state in the batch AFTER the one that advances it
      clicks.addData((ts(59), 9L))
      purchases.addData((ts(59), 9L, 1.0))
      query.processAllAvailable()
      clicks.addData((ts(59), 8L))
      query.processAllAvailable()
      val orphan = spark.table("attribution_outer_test").collect()
        .filter(_.getAs[Long]("user_id") == 3L)
      assert(orphan.length == 1, "orphan purchase must emit exactly once")
      assert(orphan(0).isNullAt(orphan(0).fieldIndex("click_ts")),
        "orphan emits with null click columns")
      assert(orphan(0).getAs[Double]("purchase_value") == 55.0)
    } finally query.stop()
  }

  test("transformWithState running totals match mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    // state-v2 needs a multi-column-family store → RocksDB provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[EventStreams.EventRow]
    val query = EventStreams.runningUserTotalsV2(input.toDS())
      .writeStream.format("memory").queryName("state_v2_test")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(EventStreams.EventRow(7L, ts(0), 2.5),
        EventStreams.EventRow(7L, ts(1), 2.5))
      query.processAllAvailable()
      input.addData(EventStreams.EventRow(7L, ts(2), 5.0))
      query.processAllAvailable()
      val out = spark.table("state_v2_test")
        .groupBy("user_id").agg(max("n_events").as("n"),
          max("total_value").as("t")).collect()
      assert(out.head.getLong(1) == 3L)
      assert(out.head.getDouble(2) == 10.0)
    } finally {
      query.stop()
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("streaming dedup drops repeats within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "event_id", "payload")
    val query = EventStreams.dedupStream(events, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(1), 1L, "a-dup"), (ts(2), 2L, "b"))
      query.processAllAvailable()
      input.addData((ts(3), 2L, "b-dup"), (ts(4), 3L, "c"))
      query.processAllAvailable()
      val out = spark.table("dedup_stream_test")
      assert(out.count() == 3)
      assert(out.select("event_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
    } finally query.stop()
  }

  private def withRocksDb[A](body: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("timer-driven sessionization closes sessions as watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EventStreams.EventRow]
      // 10-minute gap, tight watermark so the test can advance it
      val query = EventStreams.sessionizeV2(input.toDS(),
        gapMs = 10L * 60 * 1000, watermark = "0 seconds")
        .writeStream.format("memory").queryName("sessionize_v2_test")
        .outputMode(OutputMode.Append()).start()
      try {
        // user 1: two events 5 min apart (one session) AND a second
        // burst >gap later in the same batch (a second session — the
        // buffer must gap-split, not merge)
        input.addData(EventStreams.EventRow(1L, ts(0), 1.0),
          EventStreams.EventRow(1L, ts(5), 1.0),
          EventStreams.EventRow(1L, ts(25), 1.0))
        query.processAllAvailable()
        // push the watermark way past both sessions' expiries
        input.addData(EventStreams.EventRow(2L, ts(50), 1.0))
        query.processAllAvailable()
        input.addData(EventStreams.EventRow(2L, ts(51), 1.0))
        query.processAllAvailable()
        val out = spark.table("sessionize_v2_test")
          .as[EventStreams.SessionOut].collect()
        val u1 = out.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
        assert(u1.length == 2, out.mkString(", "))
        assert(u1(0).session_start == ts(0))
        assert(u1(0).session_end == ts(5))
        assert(u1(0).n_events == 2L)
        assert(u1(1).session_start == ts(25))
        assert(u1(1).n_events == 1L)
      } finally query.stop()
    }
  }

  test("MapState per-type counts accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val input = MemoryStream[EventStreams.TypedEvent]
      val query = EventStreams.typeCountsV2(input.toDS())
        .writeStream.format("memory").queryName("type_counts_test")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(EventStreams.TypedEvent(1L, ts(0), "click"),
          EventStreams.TypedEvent(1L, ts(1), "click"),
          EventStreams.TypedEvent(1L, ts(2), "view"))
        query.processAllAvailable()
        input.addData(EventStreams.TypedEvent(1L, ts(3), "click"))
        query.processAllAvailable()
        val latest = spark.table("type_counts_test")
          .groupBy("event_type").agg(max("n").as("n"))
          .as[(String, Long)].collect().toMap
        assert(latest == Map("click" -> 3L, "view" -> 1L))
      } finally query.stop()
    }
  }
}
