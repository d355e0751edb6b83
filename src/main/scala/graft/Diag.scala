package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc scale diagnostics (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    Tables.load(spark, dir, "nation").createOrReplaceTempView("nation")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")

    def attempt(label: String)(sql: String): Unit =
      try {
        val n = spark.sql(sql).count()
        println(s"OK $label rows=$n")
      } catch {
        case e: Throwable =>
          println(s"FAIL $label: ${e.getMessage.take(200)}")
      }

    attempt("lateral") {
      """SELECT n.n_name, o.o_orderkey
        |FROM nation n,
        |LATERAL (SELECT c.c_custkey FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c.c_acctbal DESC LIMIT 2) top_c,
        |LATERAL (SELECT o_orderkey FROM orders
        |         WHERE o_custkey = top_c.c_custkey LIMIT 1) o
        |""".stripMargin
    }
    attempt("recursive") {
      """WITH RECURSIVE r(n, s) AS (
        |  SELECT 1, CAST(1 AS BIGINT)
        |  UNION ALL
        |  SELECT n + 1, s + n + 1 FROM r WHERE n < 10
        |)
        |SELECT * FROM r""".stripMargin
    }
    attempt("variant") {
      """SELECT variant_get(parse_json('{"a": 5}'), '$.a', 'int') AS a"""
    }
    spark.stop()
  }
}
