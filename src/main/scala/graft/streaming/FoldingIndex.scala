package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incremental (fold-in) maintenance for the streaming probe indexes —
  * the piece that turns the six pinned-index ingest probes into a
  * production curation-at-the-door pipeline: accepted arrivals are
  * periodically MERGED into the index the next batches probe, without
  * a full rebuild (VERDICT r14 Next #1; the reference's closest analog
  * is its ingest-while-reading threaded pipeline,
  * `import_fantoir.py:42-102` — keep loading while the source still
  * streams).
  *
  * Design: an LSM-style tiered relation.
  *
  *  - `base` — the caller's corpus index, built by the SAME batch
  *    builder the batch operators use (minhashSignatures /
  *    deletionKeys / fingerprints / scrubIndex / segmentIndex /
  *    buildSemanticIndex / Decontam's gram explode), typically
  *    FrameCache-pinned and pre-partitioned by its bucket key. Never
  *    re-persisted or unpersisted here — the caller owns it.
  *  - deltas — one small frame per fold, `builder(arrivals)` output
  *    `localCheckpoint(eager)`-ed: materialized at fold time (a
  *    foreachBatch micro-batch frame is only valid during its batch —
  *    a lazy plan over it could not be re-executed later) with lineage
  *    cut flat, so a long-running ingest never accumulates plan depth.
  *  - [[current]] — base ∪ deltas, what every probe joins. Union keeps
  *    the FIRST child's schema, so the column-metadata stamps the
  *    probe `require`s (EdJoin k, scrub L, CDC divisor, IVF centroid
  *    fingerprint) ride through from `base` unchanged — and the delta
  *    builder stamps identically, because it IS the batch builder.
  *  - [[compact]] — every `compactEvery` folds the tiers collapse into
  *    one repartitioned checkpoint (the bucket-key partitioning the
  *    probe joins reuse), bounding both the union fan-in and the
  *    per-batch exchange: between compactions only delta tiers lack
  *    the index partitioning, and they are micro-batch-sized.
  *
  * Bounded-metadata contract (the collectSample/centroid discipline):
  * the index is NEVER collected — folds and compactions are pure
  * DataFrame ops; the only driver-side state is counters and the
  * last-folded batch id. Row counts are taken on DELTA frames only
  * (micro-batch-scale, already materialized by the checkpoint).
  *
  * Delivery semantics: foreachBatch is at-least-once — a re-delivered
  * batch must not fold twice, so [[foldIn]]/[[foldInRows]] are
  * idempotent keyed on `batchId` (monotonic skip: micro-batch ids are
  * strictly increasing within a stream). This is the same
  * batchId-keyed discipline every probe sink follows.
  *
  * Durability: tiers live in THIS session's block manager — the
  * fold-in is in-session incremental maintenance. A process restart
  * rebuilds from the durable corpus (the documented
  * restart-and-rebuild path); exactly-once across restarts would need
  * the accepted arrivals persisted to storage, which is the sink's
  * job, not the index's.
  *
  * Concurrency and ownership: all mutators are synchronized, so
  * concurrent READERS of [[current]]/[[currentTiers]] are safe — but
  * the index has exactly ONE writer stream. The batchId idempotence
  * watermark is a single monotonic counter; two folding streams with
  * independent batchId sequences would silently skip each other's
  * folds (stream B's batch 3 after stream A's batch 5 reads as a
  * redelivery). Cross-stream WRITE sharing needs one index per
  * stream, or a single merged stream in front.
  */
final class FoldingIndex private (
    builder: DataFrame => DataFrame,
    bucketCols: Seq[String],
    numPartitions: Int,
    compactEvery: Int,
    dedupKeyCols: Seq[String],
    compactor: Option[DataFrame => DataFrame],
    base: DataFrame) {

  /** Stamped fold metadata — bumped on every accepted fold. */
  final case class Meta(generation: Long, folds: Long, foldedRows: Long,
                        compactions: Long, tiers: Int)

  // each delta with its materialized row count (known at fold time —
  // the checkpoint already forced it), so probe-time tier snapshots
  // can skip empty tiers without an extra job
  private var deltas: Vector[(DataFrame, Long)] = Vector.empty
  private var lastBatchId: Long = Long.MinValue
  private var generation: Long = 0L
  private var folds: Long = 0L
  private var foldedRows: Long = 0L
  private var compactions: Long = 0L
  // after a compaction the base tier is the compacted checkpoint, not
  // the caller's frame
  private var baseTier: DataFrame = base

  def meta: Meta = synchronized {
    Meta(generation, folds, foldedRows, compactions, 1 + deltas.size)
  }

  /** The relation probes join: base ∪ all folded deltas. A lazy plan —
    * cheap to rebuild per batch; the tiers behind it are materialized.
    */
  def current: DataFrame = synchronized {
    deltas.map(_._1).foldLeft(baseTier)(_ unionByName _)
  }

  /** Tier snapshot for PER-TIER probing — the LSM read path. A `Union`
    * plan reports no output partitioning even when every child is
    * bucket-partitioned, so a probe joining [[current]] re-exchanges
    * the corpus-scale base tier on EVERY micro-batch; joining the
    * tiers separately and unioning the RESULTS keeps the base tier's
    * checkpoint-preserved partitioning reused (only the micro-batch
    * side exchanges — the pinned-probe contract) while each delta join
    * is micro-batch-sized on both sides. Semantically exact for every
    * probe in the family: an equi-join hit set or a covered-span set
    * against base ∪ deltas IS the union of the per-tier sets. Empty
    * deltas are skipped (a probe against them cannot produce rows);
    * the base tier is always included.
    */
  def currentTiers: Seq[DataFrame] = synchronized {
    baseTier +: deltas.collect { case (d, n) if n > 0 => d }
  }

  /** Fold arrivals through the shared batch builder. Returns the rows
    * appended (0 on an idempotent skip).
    */
  def foldIn(batchId: Long, arrivals: DataFrame): Long =
    foldInRows(batchId, builder(arrivals))

  /** Fold PRE-BUILT index rows (for ingest streams that already ran
    * the builder on the batch for their own probe — signing a batch
    * twice would double the dominant per-batch cost). `rows` must be
    * builder output: same schema, same stamps.
    */
  def foldInRows(batchId: Long, rows: DataFrame): Long = synchronized {
    if (batchId <= lastBatchId) 0L // at-least-once re-delivery: skip
    else {
      val deduped =
        if (dedupKeyCols.isEmpty) rows
        // distinct-set indexes (CDC digests): a row already present in
        // a lower tier must not re-enter, or downstream left-join
        // multiplicities change. Batch-side anti join: small probe
        // stream against the tiered index, the probe join's own shape.
        else rows.join(current.select(dedupKeyCols.map(col): _*),
          dedupKeyCols, "left_anti")
      val delta = deduped.localCheckpoint(true)
      val n = delta.count()
      deltas = deltas :+ ((delta, n))
      lastBatchId = batchId
      generation += 1
      folds += 1
      foldedRows += n
      if (deltas.size >= compactEvery) compact()
      n
    }
  }

  /** Collapse all tiers into one checkpoint repartitioned by the
    * bucket key — the probe joins again reuse the index partitioning
    * with only the batch side exchanging. Old tiers are dropped from
    * the tier list; their checkpoint blocks are reclaimed by the
    * ContextCleaner once unreferenced.
    */
  def compact(): Unit = synchronized {
    val folded = compactor.fold(current)(f => f(current))
    val merged =
      if (bucketCols.isEmpty)
        folded.repartition(numPartitions)
      else folded.repartition(numPartitions, bucketCols.map(col): _*)
    baseTier = merged.localCheckpoint(true)
    deltas = Vector.empty
    generation += 1
    compactions += 1
  }
}

object FoldingIndex {

  /** @param base        corpus index rows from the SAME builder
    *                     (caller-pinned; its column stamps become the
    *                     union's)
    * @param builder      arrivals → index rows — the batch builder,
    *                     shared verbatim with the batch operators
    * @param bucketCols   the probe join key(s); compaction repartitions
    *                     on them
    * @param numPartitions compaction partition count (the pinned
    *                     index's own, e.g. the session's cpu count)
    * @param compactEvery fold count between compactions
    * @param dedupKeyCols non-empty for DISTINCT-set indexes: new rows
    *                     anti-join the current index on these before
    *                     appending (e.g. CDC's digest set)
    * @param compactor    applied to the union at compaction — for
    *                     AGGREGATE indexes whose tiers carry partial
    *                     values (e.g. per-tier gram document
    *                     frequencies re-summed to global counts)
    */
  def apply(base: DataFrame, builder: DataFrame => DataFrame,
            bucketCols: Seq[String], numPartitions: Int,
            compactEvery: Int = 16,
            dedupKeyCols: Seq[String] = Nil,
            compactor: Option[DataFrame => DataFrame] = None)
      : FoldingIndex = {
    require(compactEvery >= 1, s"compactEvery=$compactEvery must be >= 1")
    new FoldingIndex(builder, bucketCols, numPartitions, compactEvery,
      dedupKeyCols, compactor, base)
  }
}
