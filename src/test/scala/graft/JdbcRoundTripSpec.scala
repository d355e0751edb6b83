package graft

import java.sql.{Date, DriverManager}

import graft.schema._
import graft.sinks.{DerbyDialect, JdbcSink}
import org.apache.spark.sql.functions._

/** REAL JDBC round-trip over embedded Derby: the whole sink lifecycle
  * (K1 create → K4 batched insert via df.write.jdbc → K5 index) executes
  * against a live database, then the table is read back through
  * spark.read.jdbc and compared row-for-row. This is the integration
  * check the reference runs against SQLite
  * (`/root/reference/tests/test_import_sirene.py:68-74`) — same shape,
  * JVM-native database.
  */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = new java.util.Properties()

  private val tableDef = SqlTableDef(
    "siren_mini",
    Seq(
      SqlFieldDef("siren_mini", "siren", SqlTypes.BIGINT, rank = 0,
        comment = "company id"),
      SqlFieldDef("siren_mini", "nom", SqlTypeDef("varchar(100)",
        org.apache.spark.sql.types.StringType), rank = 1),
      SqlFieldDef("siren_mini", "capital", SqlTypes.DOUBLE_PRECISION,
        rank = 2),
      SqlFieldDef("siren_mini", "creation", SqlTypes.DATE, rank = 3)),
    Seq(SqlIndexDef("siren_mini", "siren", SqlIndexType.Hash)))

  test("write → index → read-back round-trips through a live database") {
    val rows = Seq(
      (101L, "ACME", 1000.5, Date.valueOf("2001-01-15")),
      (102L, "GLOBEX", 250.0, Date.valueOf("2010-06-30")),
      (103L, "INITECH", 99.25, Date.valueOf("1999-12-01")))
    val df = rows.toDF("siren", "nom", "capital", "creation")

    new JdbcSink(url, props, DerbyDialect).writeTable(df, tableDef,
      numPartitions = 2)

    val back = spark.read.jdbc(url, "siren_mini", props)
      .as[(Long, String, Double, Date)].collect()
      .map(t => (t._1, t._2, t._3, t._4.toString)).toSet
    assert(back == rows.map(t => (t._1, t._2, t._3, t._4.toString)).toSet)

    // the K5 index really exists in the catalog
    val conn = DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getIndexInfo(null, null, "SIREN_MINI",
        false, false)
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("INDEX_NAME")).toSet
      assert(names.map(n => Option(n).map(_.toLowerCase).getOrElse(""))
        .contains("siren_siren_mini_idx"), names.toString)
    } finally conn.close()

    // filter pushdown reaches the JDBC source on read-back (same test so
    // the table's existence doesn't depend on cross-test ordering)
    val plan = spark.read.jdbc(url, "siren_mini", props)
      .filter(col("siren") > 101L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("SIREN"),
      plan.take(600))
  }
}
