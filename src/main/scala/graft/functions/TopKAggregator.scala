package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.b, UDF/UDAF row): per-group top-k as
  * an `Aggregator` with a bounded buffer.
  *
  * Scale rationale vs the window formulation (`row_number` + filter):
  * the window sorts every group's FULL row set (Spark's WindowGroupLimit
  * mitigates but still shuffles one candidate set per partition); this
  * aggregator's partial buffers never exceed k entries, so the shuffle
  * carries at most k·partitions rows per group and the merge is k-way —
  * the classic map-side-heap top-k. Deterministic: ties break to the
  * smaller id.
  *
  * Usable from the typed API (`ds.groupByKey(...).agg(topK.toColumn)`)
  * and from DataFrames via `functions.udaf` (see
  * `GraftFunctions.register`).
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: Seq[Scored]): Seq[Scored] =
    xs.sortWith(better).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    // cheap fast-path: a full buffer whose worst entry beats `a` is
    // unchanged — the common case once the heap warms up
    if (buf.size >= k && better(buf.last, a)) buf
    else trim(buf :+ a)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    trim(b1 ++ b2)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
