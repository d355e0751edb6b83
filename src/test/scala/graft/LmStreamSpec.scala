package graft

import java.nio.file.Files

import graft.operators.LmScore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming quality gate must agree with batch scoring — both run
  * through the SAME LmScore implementation, and this pins it
  * end-to-end: fit on a static corpus, score a MemoryStream in
  * micro-batches, compare per-doc NLL to one batch call.
  */
class LmStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream scores equal batch scores, doc by doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick red fox runs fast"),
      (3L, "a slow green turtle naps under the dog")
    ).toDF("doc_id", "text")
    val model = LmScore.fitUnigram(train, "text")

    val incoming = Seq(
      (10L, "the quick fox"),          // all in-vocab
      (11L, "purple elephants sing"),  // all OOV → worst score
      (12L, "the the the the")         // repetitive, best score
    )
    val batchScores = collect(
      LmScore.score(model, incoming.toDF("doc_id", "text"),
        "doc_id", "text"))

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val landed = scala.collection.mutable.Map[Long, (Int, Double)]()
    val checkpoint = Files.createTempDirectory("graft_lm_ckpt").toString
    val query = LmScore.scoreStream(model,
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
        checkpoint) { (scored, _) =>
      landed ++= collect(scored)
    }.start()
    try {
      stream.addData(incoming(0), incoming(1))
      query.processAllAvailable()
      stream.addData(incoming(2))
      query.processAllAvailable()
    } finally query.stop()

    assert(landed.toMap == batchScores,
      s"stream $landed vs batch $batchScores")
    // sanity on the signal itself: OOV-only doc scores worst,
    // repetitive common-token doc scores best
    assert(batchScores(11L)._2 > batchScores(10L)._2)
    assert(batchScores(12L)._2 < batchScores(10L)._2)
  }

  private def collect(df: DataFrame): Map[Long, (Int, Double)] =
    df.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getDouble(2))).toMap
}
