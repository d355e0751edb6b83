package graft

import org.apache.spark.sql.DataFrame

/** Pinned bucket-partitioned relations — the one way graft builds a
  * corpus-scale index a per-batch probe can join WITHOUT re-exchanging
  * the corpus side.
  *
  * `repartition(n, keys).localCheckpoint(true)` does NOT do this under
  * adaptive query execution: the checkpoint copies the ADAPTIVE
  * wrapper's reported partitioning — `UnknownPartitioning(0)` — into
  * the pinned relation, so every downstream join silently re-exchanges
  * it (found via `FoldingIndexSpec`'s fold-path plan assertion, r16).
  * [[byKey]] routes through
  * [[org.apache.spark.sql.graftbridge.CheckpointBridge]], which
  * constructs the pinned relation with the TRUE
  * `HashPartitioning(keys, n)`.
  */
object Pinned {

  /** Eager local checkpoint of `df` hash-partitioned on `keys` into
    * `numPartitions`, REPORTING that partitioning to the planner.
    */
  def byKey(df: DataFrame, numPartitions: Int, keys: String*): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointBridge
      .checkpointPartitioned(df, numPartitions, keys)
}
