package graft.streaming

import graft.operators.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming vector-index maintenance with PERIODIC CODEBOOK REFRESH.
  *
  * [[PqIndex.encode]] already runs unchanged on an unbounded stream (the
  * codebook collapses to plan-time literals — see `PqIndexSpec`), but a
  * long-lived index also has to handle DRIFT: the embedding distribution
  * a codebook was trained on months ago is not the distribution arriving
  * today. The production pattern is to re-fit on a recent window every N
  * batches and tag every stored code with the codebook version that
  * produced it, so (a) ADC tables are built per-version at query time —
  * codes are meaningless against any other version's codewords — and
  * (b) old segments can be re-encoded (or just aged out) lazily instead
  * of stop-the-world.
  *
  * Mechanics: `foreachBatch` gives each microbatch to [[processBatch]],
  * which re-fits from accumulated vectors on the refresh cadence (fit
  * runs on the batch engine inside foreachBatch — the standard escape
  * hatch for iterative algorithms a streaming query can't express),
  * then encodes map-side with the current version. The manager holds
  * only the codebook DataFrame + version on the driver — kilobytes; the
  * accumulated corpus stays wherever the caller's `history` points
  * (at scale: the parquet segments the stream is already sinking to).
  */
class StreamingPqIndex(m: Int, k: Int, iters: Int = 3,
                       refreshEvery: Int = 2) {

  @volatile private var codebookVersion: Int = 0
  @volatile private var codebook: Option[DataFrame] = None

  /** Current (version, codebook) — codebook is None until first batch. */
  def current: (Int, Option[DataFrame]) = (codebookVersion, codebook)

  /** RESTART RECOVERY: version numbers live only in this object, so a
    * recovered query (foreachBatch checkpoint restart) MUST re-seed
    * from its sink before processing — otherwise the fresh instance
    * re-fits as "version 1" and its tags collide with rows an earlier
    * incarnation wrote under a different version-1 codebook, silently
    * corrupting per-version ADC. Persist (version, codebook) wherever
    * the codes go (both are kilobytes) and restore them here; new
    * versions continue from `version + 1`.
    */
  def restore(version: Int, cb: DataFrame): Unit = {
    require(version > 0, s"restore: version must be positive, got $version")
    codebookVersion = version
    codebook = Some(cb)
  }

  /** Handle one microbatch: maybe refresh the codebook, then encode.
    *
    * The refresh fit samples `history` BY HASH of the id, not by
    * smallest id: with monotone stream ids an id-ordered sample would
    * pin training to the oldest rows forever, making the drift refresh
    * a no-op — the hash order keeps the sample uniform over everything
    * seen, still deterministic.
    *
    * @param batch   new vectors (idCol, vecCol) for this microbatch
    * @param batchId foreachBatch's monotone batch id
    * @param history corpus to (re-)fit on — typically the sunk segments
    *                plus this batch; only scanned on refresh batches
    * @return (id, codes, codebook_version) rows for this batch
    */
  def processBatch(batch: DataFrame, batchId: Long, history: DataFrame,
                   idCol: String, vecCol: String): DataFrame = {
    val due = codebook.isEmpty || (refreshEvery > 0 &&
      batchId % refreshEvery == 0)
    if (due) {
      codebook = Some(PqIndex.fit(history, idCol, vecCol, m, k, iters,
        sampleByHash = true))
      codebookVersion += 1
    }
    PqIndex.encode(batch, idCol, vecCol, codebook.get)
      .withColumn("codebook_version", lit(codebookVersion))
  }
}
