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

  test("forward direction joins the NEXT right row, inclusive at equal time") {
    val fwdLeft = Seq(
      (1L, 40L, "x"),  // next right is r40 itself (equal time, inclusive)
      (1L, 41L, "y"),  // next right is r95
      (1L, 96L, "z"),  // nothing after 95
      (2L, 10L, "w")   // no right rows for key 2
    ).toDF("k", "t", "tag")
    val out = AsOfJoin.asOf(fwdLeft, right, "k", "rk", "t", "rt",
        Map("payload" -> "matched"), direction = "forward")
      .select("tag", "matched").as[(String, Option[String])]
      .collect().toMap
    assert(out("x").contains("r40"), "equal-time right must be eligible")
    assert(out("y").contains("r95"))
    assert(out("z").isEmpty)
    assert(out("w").isEmpty)
  }

  test("forward maxGap bounds the look-ahead") {
    // left@41's next right is r95 (gap 54)
    val fwdLeft = Seq((1L, 41L, "y")).toDF("k", "t", "tag")
    def run(bound: Long) =
      AsOfJoin.asOf(fwdLeft, right, "k", "rk", "t", "rt",
          Map("payload" -> "matched"), direction = "forward",
          maxGap = Some((lt, rt) => rt - lt <= bound))
        .select("tag", "matched").as[(String, Option[String])]
        .collect().toMap
    assert(run(50)("y").isEmpty, "gap 54 > 50 must null out")
    assert(run(60)("y").contains("r95"), "gap 54 <= 60 must keep")
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
