package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Focused semantics of the as-of join's tolerance bound (`maxGap`);
  * the unbounded form is oracle-checked end-to-end by r05 and the
  * bounded form by e09.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 100L, "a"), // matches right@95 (gap 5)
    (1L, 200L, "b"), // nearest right@95 (gap 105) — outside maxGap 50
    (2L, 50L, "c")   // no right row at all
  ).toDF("k", "t", "tag")

  private def right = Seq(
    (1L, 95L, "r95"),
    (1L, 40L, "r40")
  ).toDF("rk", "rt", "payload")

  test("maxGap nulls out stale matches but keeps in-range ones") {
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
        Map("payload" -> "matched"),
        maxGap = Some((lt, rt) => lt - rt <= 50))
      .select("tag", "matched").as[(String, Option[String])]
      .collect().toMap
    assert(out("a").contains("r95"))
    assert(out("b").isEmpty, "105-stale match must be nulled")
    assert(out("c").isEmpty)
  }

  test("without maxGap the same stale match survives (r05 semantics)") {
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
        Map("payload" -> "matched"))
      .select("tag", "matched").as[(String, Option[String])]
      .collect().toMap
    assert(out("a").contains("r95"))
    assert(out("b").contains("r95"))
    assert(out("c").isEmpty)
  }

  test("maxGap gates on the MATCHED row's time, not any nearer unmatched one") {
    // right@95 is the match for left@200; right@40 being nearer to
    // nothing must not influence the gate
    val out = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
        Map("payload" -> "matched"),
        maxGap = Some((lt, rt) => lt - rt <= 160))
      .select("tag", "matched").as[(String, Option[String])]
      .collect().toMap
    assert(out("b").contains("r95"), "gap 105 <= 160 must keep the match")
  }
}
