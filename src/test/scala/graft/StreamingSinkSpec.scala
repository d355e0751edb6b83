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
}
