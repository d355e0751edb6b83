package graft

import graft.functions.{GraftFunctions, Scored, TopKAggregator}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def sample() = Seq(
    ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 7.0), ("a", 4L, 9.0),
    ("b", 5L, 1.0), ("b", 6L, 2.0),
    ("c", 7L, 3.0)
  ).toDF("grp", "id", "score")

  test("typed aggregator matches the window top-k formulation") {
    val df = sample()
    val byAgg = df.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKAggregator(2).toColumn)
      .collect().toMap
      .map { case (g, xs) => g -> xs.map(s => (s.id, s.score)) }

    // window formulation of the same top-2 (score desc, id asc)
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id"))
    val byWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy("grp", "rn")
      .collect()
      .groupBy(_.getString(0))
      .map { case (g, rows) =>
        g -> rows.toSeq.map(r => (r.getLong(1), r.getDouble(2))) }

    assert(byAgg == byWindow)
    assert(byAgg("a") == Seq((2L, 9.0), (4L, 9.0)))
    assert(byAgg("b") == Seq((6L, 2.0), (5L, 1.0)))
    assert(byAgg("c") == Seq((7L, 3.0)))
  }

  test("SQL surface: graft_top3 over a grouped frame") {
    GraftFunctions.register(spark)
    sample().createOrReplaceTempView("scores_tmp")
    val out = spark.sql(
      """SELECT grp, graft_top3(id, score) AS top FROM scores_tmp
         GROUP BY grp ORDER BY grp""").collect()
    val a = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(r => (r.getLong(0), r.getDouble(1))) ==
      Seq((2L, 9.0), (4L, 9.0), (3L, 7.0)))
  }

  test("merge keeps only k across partitions (bounded buffers)") {
    val big = (1L to 1000L).map(i => ("g", i, (i % 97).toDouble))
      .toDF("grp", "id", "score").repartition(8)
    val top = big.as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKAggregator(5).toColumn)
      .collect().head._2
    assert(top.size == 5)
    assert(top.forall(_.score == 96.0)) // 96 occurs >5 times; smallest ids win
    assert(top.map(_.id) == top.map(_.id).sorted)
  }
}
