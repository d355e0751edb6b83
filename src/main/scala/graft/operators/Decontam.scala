package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.Row

/** Exact-substring decontamination (the d23 operator, extracted so the
  * batch query surface and the streaming probe share one
  * implementation): find eval/test documents appearing VERBATIM inside
  * train documents.
  *
  * Seed-and-extend with a hot-key bound: word-aligned containment
  * implies EVERY eval 8-gram occurs among the containing train doc's
  * 8-grams, so each eval doc probes its MINIMUM-document-frequency
  * gram — the join fan-out is bounded by the rarest posting list the
  * doc has, and a df=0 gram proves non-containment before the join.
  * Candidates are verified with one exact `contains()` on space-padded
  * text, so hash collisions (8-byte xxhash64 keys) can only ADD
  * candidates, never produce a false leak.
  *
  * Scale shape: the index is (train_id, h8) pairs + (id, text) for
  * verification — document bodies never ride the shingle explosion;
  * the probe side shuffles (eval_id, pos, h8) triples only. The index
  * is STATIC relative to the eval feed, which is what makes the
  * streaming form below a pure per-micro-batch join with no streaming
  * state at all.
  */
object Decontam {

  /** Static train-side artifacts: the shingle index, its per-gram
    * document frequencies, and the verification texts.
    */
  final case class Index(trainIdx: DataFrame, gramDf: DataFrame,
                         trainTexts: DataFrame)

  /** Build the train-side index from (idCol, textCol) rows. Pass
    * `cacheKey` to pin the exploded shingle index through
    * [[graft.FrameCache]] — required when the index outlives one query
    * (the streaming probe) or is read more than once (it always is:
    * the DF pass and the candidate join).
    */
  def buildIndex(train: DataFrame, idCol: String, textCol: String,
                 cacheKey: Option[String] = None): Index = {
    // tokens staged into an attribute: the 8-width shingle fold
    // references its token array ~15 times, and each reference to a
    // RAW tokens(text) tree re-runs the regex split per row under
    // interpreted HOF evaluation (lambda-bearing subtrees are exempt
    // from subexpression elimination) — staging makes them row-slot
    // reads (TextFunctions.shinglesOf note)
    def explodeIdx: DataFrame = train
      .select(col(idCol).as("train_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .select(col("train_id"),
        explode(array_distinct(transform(
          TextFunctions.shinglesOf(col("ts"), 8),
          g => xxhash64(g)))).as("h8"))
    val trainIdx = cacheKey match {
      case Some(key) =>
        graft.FrameCache.cached(train.sparkSession, key)(explodeIdx)
      case None => explodeIdx
    }
    val gramDf = trainIdx.groupBy(col("h8")).agg(count(lit(1)).as("df"))
    Index(trainIdx, gramDf,
      train.select(col(idCol).as("train_id"),
        col(textCol).as("train_text")))
  }

  /** Verified (eval_id, train_id) leak pairs for a (bounded) frame of
    * eval docs against a static index. Works identically on a
    * micro-batch inside [[probeStream]].
    *
    * CONTRACT: eval docs with fewer than 8 tokens are NOT probed (they
    * have no 8-gram to seed from) and are never reported, even if
    * verbatim inside a train doc. The bound is what makes the fan-out
    * finite — a shorter seed would hit boilerplate posting lists, and
    * no seed at all would mean `contains()` against every train doc, a
    * full corpus scan per short eval. Route shorter texts through
    * [[probeShort]] (a broadcast direct check), or use [[probeAll]]
    * for the union.
    */
  def probe(index: Index, evalDocs: DataFrame, idCol: String,
            textCol: String): DataFrame = {
    val evalGrams = evalDocs
      .select(col(idCol).as("eval_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) >= 8)
      .select(col("eval_id"),
        posexplode(array_distinct(transform(
          TextFunctions.shinglesOf(col("ts"), 8),
          g => xxhash64(g)))))
      .toDF("eval_id", "pos", "h8")
    val probes = evalGrams.join(index.gramDf, Seq("h8"), "left")
      .groupBy(col("eval_id"))
      .agg(min(struct(coalesce(col("df"), lit(0L)).as("df"),
        col("pos").as("pos"), col("h8").as("h8"))).as("best"))
      .filter(col("best.df") > 0)
      .select(col("eval_id"), col("best.h8").as("h8"))
    // trainIdx is one row per distinct train gram — corpus-scaled and
    // explode-derived, so its Catalyst estimate inherits the compressed
    // text scan's bytes (the d41 kill class: a mid-scale window where
    // the estimate sits under the auto-broadcast line while the true
    // frame is gigabytes through the driver). Pinned sort-merge rather
    // than left to AQE — taken pre-emptively per the r12 adjudication
    // ("if a fifth-decade read shows a d51 stage step, pin probe's
    // trainIdx join"), because at any SF where the broadcast would be
    // correct the join is cheap anyway, and at every SF where it
    // matters the merge shape is the only survivable one.
    val cands = probes.join(index.trainIdx.hint("merge"), Seq("h8"))
      .select(col("eval_id"), col("train_id"))
      .distinct()
    cands
      .join(evalDocs.select(col(idCol).as("eval_id"),
        col(textCol).as("eval_text")), Seq("eval_id"))
      .join(index.trainTexts, Seq("train_id"))
      .filter(contains(
        concat(lit(" "), col("train_text"), lit(" ")),
        concat(lit(" "), col("eval_text"), lit(" "))))
      .select(col("eval_id"), col("train_id"))
  }

  /** Direct verification for eval docs BELOW [[probe]]'s 8-token bound:
    * the short eval texts BROADCAST against one pass over the train
    * texts, with the same space-padded word-aligned `contains()`
    * predicate probe's verification uses. No seed gram exists for
    * these docs, so the honest plan is a broadcast nested-loop — one
    * corpus scan total, with per-row cost proportional to the
    * (broadcast-sized, by definition tiny-string) short-eval set; what
    * must NOT happen at 100 TB is a scan per short eval, and this
    * shape never does that. Empty/whitespace-only eval docs match
    * nothing and are excluded. Returns (eval_id, train_id).
    */
  def probeShort(index: Index, evalDocs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val nTok = size(TextFunctions.tokens(col(textCol)))
    val shorts = evalDocs
      .filter(nTok >= 1 && nTok < 8)
      .select(col(idCol).as("eval_id"), col(textCol).as("eval_text"))
    index.trainTexts
      .join(broadcast(shorts),
        contains(
          concat(lit(" "), col("train_text"), lit(" ")),
          concat(lit(" "), col("eval_text"), lit(" "))))
      .select(col("eval_id"), col("train_id"))
  }

  /** Complete containment screen regardless of eval length: [[probe]]
    * for ≥ 8-token docs (min-DF-seeded, index-bounded) unioned with
    * [[probeShort]] for the rest (broadcast direct check).
    */
  def probeAll(index: Index, evalDocs: DataFrame, idCol: String,
               textCol: String): DataFrame =
    probe(index, evalDocs, idCol, textCol)
      .unionByName(probeShort(index, evalDocs, idCol, textCol))

  /** Streaming decontamination: probe an UNBOUNDED eval-document stream
    * against the static train index, one `foreachBatch` at a time. Late
    * or out-of-order eval docs need no special handling — the probe is
    * stateless per batch (the index is the only cross-batch artifact),
    * so every doc is probed whenever it arrives. Short eval docs follow
    * [[probe]]'s ≥ 8-token contract.
    *
    * DELIVERY SEMANTICS: foreachBatch is AT-LEAST-ONCE, not exactly
    * once. A batch whose sink ran but whose commit-log entry was not
    * yet written (a crash in that window) is RE-DELIVERED on restart
    * with the SAME `batchId` — so `sink` must be idempotent keyed on
    * `batchId`: delete-then-insert (or upsert) on
    * (batchId, eval_id, train_id), never a blind append. With such a
    * sink the restart replays only uncommitted batches and the landed
    * output is exactly-once-equivalent — the contract
    * DecontamStreamSpec's crash-redelivery test verifies.
    */
  def probeStream(evalStream: DataFrame, index: Index, idCol: String,
                  textCol: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    evalStream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(probe(index, batch, idCol, textCol), batchId)
      }
}
