package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Builds its OWN session (extensions must be installed at build time).
  * The shared test session may already exist — getOrCreate would return
  * it and silently skip the extensions — so the default/active sessions
  * are cleared first and restored after.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-installed poly_hash works from pure SQL") {
    val previous = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.plans.GraftExtensions)
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val h = spark.sql("SELECT poly_hash('hello world') AS h")
        .collect()(0).getLong(0)
      assert(h == graft.functions.PolyHash.hashBytes(
        "hello world".getBytes("UTF-8")))
      // vector kernels reachable from pure SQL through the same install
      val r = spark.sql(
        """SELECT vector_dot(array(1.0F, 2.0F, 3.0F),
                             array(4.0F, 5.0F, 6.0F)) AS d,
                  vector_l2sq(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS l
        """).collect()(0)
      assert(r.getDouble(0) == 32.0)
      assert(r.getDouble(1) == 25.0)
    } finally {
      previous.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
