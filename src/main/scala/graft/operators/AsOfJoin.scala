package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTime <= leftTime` within the same key (inclusive).
  *
  * Implemented as union + ordered window + `last(_, ignoreNulls)` rather
  * than a range join + aggregation: one shuffle on the key, linear work
  * per partition, and — critically at scale — no intermediate M×N
  * explosion when a key has many right rows before many left rows. This
  * is the plan shape a dedicated as-of physical operator would produce;
  * the window form gets it from existing Spark operators (SURVEY.md §2.b
  * maps as-of to exactly this composition).
  *
  * Ties: a right row at exactly `leftTime` is eligible; among right rows
  * with the same timestamp the one greatest by `tieBreaker` (if given)
  * wins, otherwise an arbitrary-but-deterministic one.
  *
  * `maxGap` bounds the match's staleness: a predicate over
  * (leftTime, matchedRightTime) — when it evaluates false the match is
  * nulled out AFTER the window pass, so the tolerance costs nothing
  * extra (still one shuffle, still linear; the matched right time rides
  * the payload struct as an internal field).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Map[String, String],
           tieBreaker: Option[String] = None,
           maxGap: Option[(Column, Column) => Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_payload",
        lit(null).cast(structTypeWithRt(right, payload.keys.toSeq,
          rightTime)))
    val r = right
      .select((payload.keys.toSeq ++ Seq(rightKey, rightTime))
        .distinct.map(col): _*)
      .withColumn("_k", col(rightKey))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_payload", struct(
        payload.keys.map(col).toSeq :+ col(rightTime).as("_rt"): _*))

    val lNorm = l.select(
      (leftCols.map(col) :+ col("_k") :+ col("_t") :+ col("_side") :+
        col("_payload")): _*)
    val rNorm = r.select(
      (leftCols.map(c => lit(null).cast(leftSchema(left, c)).as(c)) :+
        col("_k") :+ col("_t") :+ col("_side") :+ col("_payload")): _*)

    // right rows sort before left rows at equal time → inclusive bound;
    // tieBreaker orders equal-time right rows so "latest" is well-defined
    val ordering: Seq[Column] = Seq(col("_t").asc, col("_side").asc) ++
      tieBreaker.map(tb => col("_payload").getField(tb).asc_nulls_first).toSeq
    val w = Window.partitionBy(col("_k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = lNorm.unionByName(rNorm)
      .withColumn("_matched", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val gated = maxGap match {
      case Some(ok) => joined.withColumn("_matched",
        when(ok(col("_t"), col("_matched").getField("_rt")),
          col("_matched")))
      case None => joined
    }
    gated.select(leftCols.map(col) ++
      payload.map { case (src, out) =>
        col("_matched").getField(src).as(out)
      }.toSeq: _*)
  }

  private def leftSchema(df: DataFrame, c: String) =
    df.schema(c).dataType

  private def structTypeWithRt(right: DataFrame, names: Seq[String],
      rightTime: String) =
    org.apache.spark.sql.types.StructType(
      names.map(right.schema(_)) :+
        org.apache.spark.sql.types.StructField("_rt",
          right.schema(rightTime).dataType))
}
