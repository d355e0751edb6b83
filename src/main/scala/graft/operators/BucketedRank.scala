package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact value-at-rank by two-level range refinement — the distributed
  * exact-quantile kernel shared by w06 (global) and w07 (per group).
  *
  * No global sort and no driver state: a per-group (min,max,n) frame
  * broadcasts to stamp level-1 range buckets; bucket counts prefix-sum
  * under a window partitioned by the group; each target rank locates
  * its bucket via a broadcast join; located buckets re-bucket within
  * their own value range (level 2) and re-locate, so the final rank
  * window sees n/(nb1·nb2) rows per partition. Only located
  * (sub-)buckets' rows reach each exchange. Costs: one stats pass, two
  * counting passes, one pick pass — the algorithm's honest minimum.
  *
  * The picked values are raw column values at exact ranks, so nothing
  * drifts cross-engine. Ties in the value are broken by `tieCol` for a
  * deterministic row order; the VALUE at a rank is unaffected by the
  * tie order.
  */
object BucketedRank {

  /** Per-group (lo, hi, n) over `valueCol`, eagerly pinned (one scan,
    * many readers). Empty `groupCols` → one global row (internal `_g`
    * key, also returned so callers can join on it).
    */
  def groupStats(df: DataFrame, groupCols: Seq[String],
                 valueCol: String): DataFrame = {
    val keyed = withKey(df, groupCols)
    keyed.groupBy(keys(groupCols).map(col): _*)
      .agg(min(col(valueCol)).cast("double").as("lo"),
        max(col(valueCol)).cast("double").as("hi"),
        count(lit(1)).as("n"))
      .localCheckpoint(true)
  }

  /** For each `targets` row (group key + `p` label + 1-indexed rank
    * `rt`), the exact `valueCol` value at that rank within the group.
    * Returns group cols + p + value. `stats` must come from
    * [[groupStats]] on the same frame.
    */
  def valueAtRank(df: DataFrame, stats: DataFrame, targets: DataFrame,
                  groupCols: Seq[String], valueCol: String,
                  tieCol: String, nb1: Int = 256,
                  nb2: Int = 64): DataFrame = {
    val ks = keys(groupCols)
    val grouped = groupCols.nonEmpty
    // In the global (ungrouped) case every frame carries the same
    // constant `_g`; joining on it makes Spark log a "trivially true
    // equals predicate '0L == 0'" WARN per join. Drop `_g` from the
    // right side instead: keys-beyond-`_g` stay a real equi-join, and a
    // `_g`-only join becomes an explicit broadcast cross join (the right
    // frames are one-row / ≤nb1-row by construction).
    def joinOn(l: DataFrame, r: DataFrame, all: Seq[String],
               bcast: Boolean): DataFrame =
      if (grouped) {
        l.join(if (bcast) broadcast(r) else r, all)
      } else {
        val rest = all.filterNot(_ == "_g")
        val r2 = r.drop("_g")
        val rh = if (bcast) broadcast(r2) else r2
        if (rest.isEmpty) l.crossJoin(rh) else l.join(rh, rest)
      }
    val base = joinOn(withKey(df, groupCols), stats, ks, bcast = true)
      .withColumn("_b1", bucket(col(valueCol), col("lo"), col("hi"), nb1))

    // the global case's offset window spans all (≤nb1) bucket counts in
    // one partition BY DESIGN (the frame is bounded by construction) —
    // but partitioning it by the foldable `_g` constant makes Catalyst
    // fold the spec away and WindowExec then WARNs "No Partition
    // Defined … single partition" once per task. pmod(_b1, 1) is the
    // same always-zero key, expressed non-foldably: identical
    // execution, defined spec, clean logs.
    val off1Part: Seq[Column] =
      if (grouped) ks.map(col) else Seq(pmod(col("_b1"), lit(1)))
    val wOff1 = Window.partitionBy(off1Part: _*).orderBy(col("_b1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off1 = base.groupBy((ks :+ "_b1").map(col): _*)
      .agg(count(lit(1)).as("_c1"))
      .withColumn("_o1", coalesce(sum(col("_c1")).over(wOff1), lit(0L)))
    val loc1 = joinOn(withKey(targets, groupCols), off1, ks, bcast = !grouped)
      .filter(col("rt") > col("_o1") &&
        col("rt") <= col("_o1") + col("_c1"))
      .select((ks.map(col) :+ col("p") :+ col("_b1") :+
        (col("rt") - col("_o1")).as("_r1")): _*)

    // level 2: located buckets re-bucket within their own value range
    val lvl = joinOn(base, loc1, ks :+ "_b1", bcast = true)
      .withColumn("_lo2",
        col("lo") + col("_b1") * ((col("hi") - col("lo")) / nb1))
      .withColumn("_hi2",
        when(col("hi") === col("lo"), col("hi"))
          .otherwise(col("_lo2") + (col("hi") - col("lo")) / nb1))
      .withColumn("_b2",
        bucket(col(valueCol), col("_lo2"), col("_hi2"), nb2))
    val grpP = ks :+ "p"
    val wOff2 = Window.partitionBy(grpP.map(col): _*).orderBy(col("_b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val off2 = lvl.groupBy((grpP :+ "_b2").map(col): _*)
      .agg(count(lit(1)).as("_c2"))
      .withColumn("_o2", coalesce(sum(col("_c2")).over(wOff2), lit(0L)))
    val loc2 = joinOn(loc1.select((grpP.map(col) :+ col("_r1")): _*),
      off2, grpP, bcast = false)
      .filter(col("_r1") > col("_o2") &&
        col("_r1") <= col("_o2") + col("_c2"))
      .select((grpP.map(col) :+ col("_b2") :+
        (col("_r1") - col("_o2")).as("_r2")): _*)

    val wIn = Window.partitionBy((grpP :+ "_b2").map(col): _*)
      .orderBy(col(valueCol), col(tieCol))
    joinOn(lvl, loc2, grpP :+ "_b2", bcast = true)
      .withColumn("_rn", row_number().over(wIn).cast("long"))
      .filter(col("_rn") === col("_r2"))
      .select((groupCols.map(col) :+ col("p") :+
        col(valueCol).as("value")): _*)
  }

  private def keys(groupCols: Seq[String]): Seq[String] =
    if (groupCols.isEmpty) Seq("_g") else groupCols

  private def withKey(df: DataFrame, groupCols: Seq[String]): DataFrame =
    if (groupCols.isEmpty) df.withColumn("_g", lit(0)) else df

  private def bucket(v: Column, lo: Column, hi: Column,
                     nb: Int): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((v.cast("double") - lo) / ((hi - lo) / nb))
        .cast("int"), lit(nb - 1)))
}
