package graft

import graft.operators.PqIndex
import graft.streaming.StreamingPqIndex
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming PQ index maintenance with periodic codebook refresh:
  * versions bump on the refresh cadence, every emitted code row is
  * tagged with the version that produced it, and codes are exactly what
  * batch-encoding with that version's codebook yields.
  */
class StreamingPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def cluster(center: Float, ids: Range) =
    ids.map(i => (i.toLong,
      Array.tabulate(8)(d => center + 0.1f * (i % 4) * (1 + d % 3))))

  test("codebook refreshes on cadence; codes match their version") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val idx = new StreamingPqIndex(m = 4, k = 3, refreshEvery = 2)

    val emitted = collection.mutable.ArrayBuffer
      .empty[(Long, Seq[Int], Int)]
    val codebooks = collection.mutable.Map.empty[Int, DataFrame]
    var history: DataFrame = null

    val query = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        history = if (history == null) batch else history.union(batch)
        val enc = idx.processBatch(batch, id, history,
          "vec_id", "embedding")
        val (v, cb) = idx.current
        codebooks.getOrElseUpdate(v, cb.get)
        emitted ++= enc.collect().map(r =>
          (r.getLong(0), r.getSeq[Int](1), r.getInt(2)))
        (): Unit
      }
      .start()
    try {
      // batch 0: first sight of the data → fit (version 1)
      input.addData(cluster(10.0f, 0 until 4))
      query.processAllAvailable()
      // batch 1: off-cadence → still version 1
      input.addData(cluster(-10.0f, 4 until 8))
      query.processAllAvailable()
      // batch 2: on-cadence → re-fit over all history (version 2)
      input.addData(cluster(0.0f, 8 until 12))
      query.processAllAvailable()
    } finally query.stop()

    val byVersion = emitted.groupBy(_._3).view
      .mapValues(_.map(t => t._1 -> t._2).toMap).toMap
    assert(byVersion.keySet == Set(1, 2))
    assert(byVersion(1).keySet == (0L until 8L).toSet) // batches 0+1
    assert(byVersion(2).keySet == (8L until 12L).toSet) // batch 2

    // restart recovery: a fresh instance re-seeded from the sink
    // continues the version sequence instead of colliding at 1
    val recovered = new StreamingPqIndex(m = 4, k = 3, refreshEvery = 2)
    recovered.restore(2, codebooks(2))
    val afterRestart = recovered.processBatch(
      spark.createDataFrame(cluster(5.0f, 12 until 16))
        .toDF("vec_id", "embedding"),
      batchId = 4, history = history, "vec_id", "embedding")
      .select("codebook_version").distinct().collect().map(_.getInt(0))
    assert(afterRestart.toSeq == Seq(3),
      "post-restore refresh must continue from the restored version")

    // every emitted code row reproduces under ITS version's codebook
    for ((v, rows) <- byVersion) {
      val ids = rows.keySet
      val again = PqIndex.encode(
        spark.createDataFrame(
          (0 until 12).map(i => (i.toLong,
            cluster(Seq(10.0f, -10.0f, 0.0f)(i / 4), i to i).head._2)))
          .toDF("vec_id", "embedding")
          .filter(col("vec_id").isin(ids.toSeq: _*)),
        "vec_id", "embedding", codebooks(v))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(again == rows, s"version $v codes drifted")
    }
  }
}
