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
  *
  * `direction = "forward"` flips the semantics to the NEXT right row
  * with `rightTime >= leftTime` (inclusive): same union, the window
  * frame runs [current, +∞) and takes the FIRST non-null payload; at
  * equal timestamps left rows sort before right rows so the equal-time
  * right stays eligible, and among equal-time right rows the one
  * SMALLEST by `tieBreaker` wins (mirror of backward's greatest). A
  * NULL `tieBreaker` value loses to every non-null one in both
  * directions.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Map[String, String],
           tieBreaker: Option[String] = None,
           maxGap: Option[(Column, Column) => Column] = None,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
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

    // backward: right rows sort BEFORE left rows at equal time and the
    // frame looks back — last non-null payload = latest right ≤ t.
    // forward: left rows sort first, the frame looks ahead — first
    // non-null payload = earliest right ≥ t. tieBreaker makes the
    // equal-time winner deterministic, and a NULL tieBreaker loses to
    // every non-null one in BOTH directions (backward's last() picks
    // the final frame row, so nulls must sort first; forward's first()
    // picks the initial frame row, so nulls must sort last).
    val sideOrder = if (backward) col("_side").asc else col("_side").desc
    val ordering: Seq[Column] = Seq(col("_t").asc, sideOrder) ++
      tieBreaker.map { tb =>
        val f = col("_payload").getField(tb)
        if (backward) f.asc_nulls_first else f.asc_nulls_last
      }.toSeq
    val base = Window.partitionBy(col("_k")).orderBy(ordering: _*)
    val w =
      if (backward)
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched =
      if (backward) last(col("_payload"), ignoreNulls = true).over(w)
      else first(col("_payload"), ignoreNulls = true).over(w)

    val joined = lNorm.unionByName(rNorm)
      .withColumn("_matched", matched)
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
