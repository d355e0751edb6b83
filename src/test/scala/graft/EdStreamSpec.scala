package graft

import graft.operators.EdJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Character-level dedup-on-ingest: a stream of new strings probed per
  * micro-batch against a static corpus deletion-neighborhood index —
  * within-k arrivals are flagged with their true distance, clean
  * arrivals pass silently, and the streaming verdicts agree with the
  * batch [[EdJoin.editPairsByDeletion]] miner.
  */
class EdStreamSpec extends SparkSpec {
  import spark.implicits._

  private val corpusRows = Seq(
    (1L, "Customer#000000042"),
    (2L, "Customer#000000777"),
    (3L, "Supplier#000000042"))

  test("stream probe flags within-k arrivals with their true distance") {
    implicit val sqlCtx = spark.sqlContext
    val index = EdJoin.deletionKeys(
      corpusRows.toDF("id", "name"), "id", "name", k = 1)

    val input = MemoryStream[(Long, String)]
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_ed_ckpt").toString
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, Int)]()

    val query = EdJoin.editProbeStream(
      input.toDF().toDF("id", "name"), "id", "name", index, k = 1,
      checkpoint) { (batchHits, _) =>
      batchHits.collect().foreach(r =>
        hits.add((r.getLong(0), r.getLong(1), r.getInt(2))))
    }.start()
    try {
      // 100: one substitution off corpus 1; 101: exact dup of corpus 2;
      // 102: clean (2 edits from everything at k=1)
      input.addData((100L, "Customer#000000043"),
        (101L, "Customer#000000777"),
        (102L, "Customer#000000519"))
      query.processAllAvailable()
      assert(hits.toArray(Array.empty[(Long, Long, Int)]).toSet ==
        Set((100L, 1L, 1), (101L, 2L, 0)))

      // a deletion variant arrives a batch later: 17-char string one
      // DELETION away from corpus 1 — lengths differ, keys still match
      input.addData((103L, "Customer#00000042"))
      query.processAllAvailable()
      assert(hits.toArray(Array.empty[(Long, Long, Int)]).toSet ==
        Set((100L, 1L, 1), (101L, 2L, 0), (103L, 1L, 1)))
    } finally query.stop()
  }

  test("crash between sink and commit re-delivers the batch with the " +
      "same batchId; a batchId-keyed sink stays exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val index = EdJoin.deletionKeys(
      corpusRows.toDF("id", "name"), "id", "name", k = 1)
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft_ed_crash").toString

    val byBatch = new java.util.concurrent.ConcurrentHashMap[
      Long, Set[(Long, Long)]]()
    val deliveries =
      new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var crashOnce = true
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batchHits, batchId) => {
        val rows = batchHits.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        deliveries.add(batchId)
        byBatch.put(batchId, rows) // upsert on batchId = idempotent
        if (crashOnce) {
          crashOnce = false
          throw new RuntimeException("crash before checkpoint commit")
        }
      }

    val input = MemoryStream[(Long, String)]
    input.addData((100L, "Customer#000000043"),
      (102L, "Customer#000000519"))
    val q1 = EdJoin.editProbeStream(
      input.toDF().toDF("id", "name"), "id", "name", index, k = 1,
      checkpoint)(sink).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!q1.isActive, "query must die with the sink")

    val q2 = EdJoin.editProbeStream(
      input.toDF().toDF("id", "name"), "id", "name", index, k = 1,
      checkpoint)(sink).start()
    try q2.processAllAvailable() finally q2.stop()

    val ids = deliveries.toArray(Array.empty[java.lang.Long]).toSeq
    assert(ids.size >= 2, s"expected a re-delivery, saw $ids")
    assert(ids.distinct.size < ids.size,
      s"re-delivery must reuse the original batchId, saw $ids")
    val landed = byBatch.values().toArray
      .flatMap(_.asInstanceOf[Set[(Long, Long)]]).toSet
    assert(landed == Set((100L, 1L)),
      s"idempotent sink must land the exactly-once result, got $landed")
  }

  test("streaming verdicts agree with the batch deletion-neighborhood miner") {
    val streamed = Seq((100L, "Customer#000000043"),
      (101L, "Customer#000000777"), (102L, "Customer#000000519"))
    val all = (corpusRows ++ streamed).toDF("id", "name")
    val batchPairs = EdJoin.editPairsByDeletion(all, "id", "name", k = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every streaming (new, corpus) hit appears among the batch pairs
    assert(batchPairs.contains((1L, 100L)))
    assert(batchPairs.contains((2L, 101L)))
    // and the clean arrival pairs with nothing in the corpus
    assert(!batchPairs.exists { case (a, b) =>
      (a == 102L && b <= 3L) || (b == 102L && a <= 3L) })
  }
}
