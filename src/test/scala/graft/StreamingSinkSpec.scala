package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming → JDBC composition (SURVEY.md §2.b prescription): an
  * unbounded deduped stream lands in a LIVE database through
  * `foreachBatch`, reusing the batch sink path per micro-batch. This is
  * the incremental version of the reference's whole import lifecycle —
  * each micro-batch plays the role of one bulk load.
  */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 11:$minute%02d:00")

  test("streaming dedup lands in a live JDBC sink via foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftstream;create=true"
    val props = new java.util.Properties()
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString

    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = EventStreams.dedupStream(
      input.toDF().toDF("ts", "event_id", "payload"), Seq("event_id"))

    val query = EventStreams.toForeachBatchSink(deduped, checkpoint) {
      (batch, _) =>
        // append creates the table on the first non-empty batch
        batch.write.mode("append").jdbc(url, "events_dedup", props)
    }.start()
    try {
      input.addData((ts(0), 1L, "a"), (ts(1), 1L, "dup"), (ts(2), 2L, "b"))
      query.processAllAvailable()
      input.addData((ts(3), 2L, "dup"), (ts(4), 3L, "c"))
      query.processAllAvailable()
      val landed = spark.read.jdbc(url, "events_dedup", props)
      assert(landed.count() == 3)
      assert(landed.select("event_id").as[Long].collect().toSet ==
        Set(1L, 2L, 3L))
    } finally query.stop()
  }

  test("streaming micro-batches land through the NATIVE bulk path " +
    "(first batch full lifecycle, then COPY-only appends)") {
    import graft.schema._
    import graft.sinks.JdbcSink
    implicit val sqlCtx = spark.sqlContext
    val url = "jdbc:derby:memory:graftstreambulk;create=true"
    val props = new java.util.Properties()
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_stream_bulk_ckpt").toString
    val tableDef = SqlTableDef("events_bulk",
      Seq(SqlFieldDef("events_bulk", "event_id", SqlTypes.BIGINT, rank = 0),
        SqlFieldDef("events_bulk", "payload", SqlTypeDef("varchar(40)",
          org.apache.spark.sql.types.StringType), rank = 1)),
      Seq.empty)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Derby-compatible lifecycle (no DROP/ANALYZE — fresh in-memory db)
    object MinimalDerby extends graft.sinks.SinkDialect {
      override def dropTable(t: SqlTableDef): Seq[String] = Seq.empty
      override def createIndex(t: SqlTableDef,
                               ix: SqlIndexDef): Seq[String] = Seq.empty
    }
    val sink = new JdbcSink(url, props, MinimalDerby, seen.add(_))

    val input = MemoryStream[(Long, String)]
    val query = EventStreams.toForeachBatchSink(
      input.toDF().toDF("event_id", "payload"), checkpoint) {
      (batch, id) =>
        if (id == 0) sink.writeTableBulk(batch, tableDef,
          BulkCopySpec.DerbyCsvChannel)
        else sink.appendBulk(batch, tableDef, BulkCopySpec.DerbyCsvChannel)
    }.start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      query.processAllAvailable()
      input.addData((3L, "c"))
      query.processAllAvailable()
      val landed = spark.read.jdbc(url, "events_bulk", props)
        .as[(Long, String)].collect().toSet
      assert(landed == Set((1L, "a"), (2L, "b"), (3L, "c")))
      // exactly one CREATE; one COPY per non-empty batch; appends never
      // re-run DDL
      val kinds = seen.toArray(Array.empty[String]).toSeq
        .map(_.takeWhile(_ != ' '))
      assert(kinds.count(_ == "CREATE") == 1, kinds.toString)
      assert(kinds.count(_ == "COPY") == 2, kinds.toString)
      assert(kinds.last == "COPY", kinds.toString)
    } finally query.stop()
  }
}
