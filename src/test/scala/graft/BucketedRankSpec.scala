package graft

import graft.operators.BucketedRank
import org.apache.spark.sql.functions._

/** The two-level value-at-rank kernel behind w06/w07, checked against
  * a local sort on fixtures the bucketing must survive: duplicate
  * values, a constant group (hi == lo), groups of size 1, and ranks at
  * both ends.
  */
class BucketedRankSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Seq[(String, Double, Long)] = {
    val a = (1 to 500).map(i => ("a", ((i * 37) % 97).toDouble, i.toLong))
    val b = (1 to 101).map(i => ("b", ((i * 11) % 13).toDouble, 1000L + i))
    val c = Seq(("c", 42.0, 2000L), ("c", 42.0, 2001L), ("c", 42.0, 2002L))
    val d = Seq(("d", -5.5, 3000L))
    a ++ b ++ c ++ d
  }

  private def exactAtRank(g: String, rt: Int): Double =
    rows.filter(_._1 == g).map(_._2).sorted.apply(rt - 1)

  test("grouped value-at-rank matches a local sort on hostile fixtures") {
    val df = rows.toDF("grp", "v", "id")
    val stats = BucketedRank.groupStats(df, Seq("grp"), "v")
    // per group: min (rank 1), median, max (rank n)
    val targets = stats.select(col("grp"), col("n"))
      .select(col("grp"), explode(array(
        struct(lit("min").as("p"), lit(1L).as("rt")),
        struct(lit("med").as("p"),
          (floor(lit(0.5) * (col("n") - 1)) + 1).cast("long").as("rt")),
        struct(lit("max").as("p"), col("n").as("rt")))).as("t"))
      .select(col("grp"), col("t.p").as("p"), col("t.rt").as("rt"))
    val got = BucketedRank.valueAtRank(df, stats, targets,
        Seq("grp"), "v", "id", nb1 = 16, nb2 = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2))).toSet

    val sizes = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val want = (for {
      g <- Seq("a", "b", "c", "d")
      (lbl, rt) <- Seq(("min", 1), ("med", (sizes(g) - 1) / 2 + 1),
        ("max", sizes(g)))
    } yield (g, lbl, exactAtRank(g, rt))).toSet
    assert(got == want, s"got $got\nwant $want")
  }

  test("global (empty groupCols) path picks exact ranks too") {
    val df = rows.toDF("grp", "v", "id")
    val stats = BucketedRank.groupStats(df, Nil, "v")
    val n = rows.size.toLong
    val targets = stats.select(col("_g"), lit("q1").as("p"),
      lit((n - 1) / 4 + 1).as("rt"))
    val got = BucketedRank.valueAtRank(df, stats, targets,
      Nil, "v", "id").collect()
    assert(got.length == 1)
    val want = rows.map(_._2).sorted.apply(((n - 1) / 4).toInt)
    assert(got(0).getDouble(1) == want)
  }
}
