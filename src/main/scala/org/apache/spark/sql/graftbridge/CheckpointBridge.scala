package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions.col

/** Bridge producing an eager local checkpoint that REPORTS its hash
  * partitioning — the primitive behind every "pinned bucket-partitioned
  * index" in graft.
  *
  * Why it exists: `Dataset.localCheckpoint(eager = true)` copies
  * `executedPlan.outputPartitioning` into the resulting `LogicalRDD`,
  * but under adaptive query execution the executed plan is the
  * `AdaptiveSparkPlanExec` WRAPPER, whose reported partitioning at
  * checkpoint time is `UnknownPartitioning(0)` — so a
  * `repartition(n, keys).localCheckpoint(true)` relation silently
  * loses the very partitioning it was built to pin, and every
  * downstream join re-exchanges it (measured in `FoldingIndexSpec`:
  * the base-tier scan re-appears under an Exchange). This bridge
  * replicates the checkpoint mechanics — execute, copy rows, RDD-level
  * local checkpoint, eager materialize — and then constructs the
  * `LogicalRDD` with the TRUE `HashPartitioning(keys, n)` the
  * repartition just produced, which is private[sql] surface
  * (`Dataset.ofRows`, `LogicalRDD`), hence the bridge package.
  */
object CheckpointBridge {

  /** `df.repartition(numPartitions, keys).localCheckpoint(eager=true)`
    * whose result REPORTS `HashPartitioning(keys, numPartitions)`, so
    * joins/aggregations keyed on `keys` reuse it with no exchange.
    */
  def checkpointPartitioned(df: DataFrame, numPartitions: Int,
                            keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty — use plain " +
      "localCheckpoint when no partitioning is being pinned")
    val rep = df.repartition(numPartitions, keys.map(col): _*)
    val classic = rep.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val qe = classic.queryExecution
    // same mechanics as Dataset.checkpoint: unsafe rows are reused by
    // the runtime, so copy before pinning them in block storage
    val rdd = qe.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager: materialize now, fail now
    val output = qe.analyzed.output
    // resolve the key attributes from the repartition's OWN analyzed
    // partition expressions (ADVICE r16): `repartition` already
    // resolved the names through the session's resolver (case
    // sensitivity, duplicate-name binding), so re-resolving here by
    // exact name could disagree with the shuffle that just ran — the
    // claimed HashPartitioning must provably use the same attributes,
    // by exprId, that partitioned the data
    val keyAttrs = qe.analyzed match {
      case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionByExpression =>
        r.partitionExpressions.map {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute => a
          case other => throw new IllegalStateException(
            s"checkpointPartitioned: non-attribute partition " +
              s"expression $other — keys are passed as plain columns, " +
              "so analysis must resolve them to attributes")
        }
      case other => throw new IllegalStateException(
        "checkpointPartitioned: expected RepartitionByExpression at " +
          s"the root of the analyzed plan, found ${other.nodeName}")
    }
    ClassicDataset.ofRows(classic.sparkSession,
      LogicalRDD(output, rdd,
        HashPartitioning(keyAttrs, numPartitions))(classic.sparkSession))
  }
}
