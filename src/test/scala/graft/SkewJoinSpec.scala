package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def large = Seq(
    (1L, "a1"), (1L, "a2"), (1L, "a3"), (2L, "b1"), (3L, "c1"))
    .toDF("k", "payload")
  private def small = Seq((1L, "dim1"), (2L, "dim2"), (4L, "dim4"))
    .toDF("k", "label")

  test("salted join equals plain join") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(large, small, "k", saltFactor = 4)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 4) // 3 rows for k=1, 1 for k=2, none for 3/4
  }

  test("selective salting equals plain join") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    val sel = SkewJoin.saltedJoinSelective(large, small, "k",
      skewedKeys = Seq(1L), saltFactor = 4)
      .select("k", "payload", "label").collect().map(_.toSeq).toSet
    assert(sel == plain)
  }

  test("salt spreads a hot key over multiple salt values") {
    val hot = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = hot.withColumn("_salt",
      pmod(xxhash64(struct(hot.columns.map(col).toSeq: _*)), lit(8))
        .cast("int"))
      .select(countDistinct(col("_salt"))).collect()(0).getLong(0)
    assert(salts == 8L)
  }
}
