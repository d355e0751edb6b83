package graft

import graft.cli.Main
import graft.pipelines.Pipelines
import graft.sinks.DerbyDialect

/** End-to-end CLI smoke (X4): the exact `Main` arg-parse → import →
  * transcript path runs over a real FANTOIR fixture, first as the
  * reference-shaped dry run (`tests/test_import_fantoir.py:63-155`
  * asserts statement order on a fake connection — our dry-run
  * transcript), then LIVE into embedded Derby through the dialect
  * registration hook, asserting loaded row counts round-trip.
  */
class CliSmokeSpec extends SparkSpec {

  private def fantoirFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("clifantoir")
    val path = s"$dir/fantoir.txt"
    val directionLine =
      "010        AIN                                             " +
        "00000000000000 00000000000000"
    val voieLine =
      "010001A008WLOT BELLEVUE                   N  3  0          " +
        "00000000000000 00000002001351               000592   BELLEVUE"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (directionLine + "\n" + voieLine + "\n").getBytes("ISO-8859-1"))
    path
  }

  test("CLI dry run: fantoir transcript printed and returned") {
    val path = fantoirFixture()
    val out = new java.io.ByteArrayOutputStream()
    val transcripts = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(spark, Array("-s", "fantoir", "-r", "pg", "-p", path))
    }
    assert(transcripts.keySet == Set("direction", "commune", "voie"))
    val voie = transcripts("voie")
    assert(voie.head == "DROP TABLE IF EXISTS voie")
    assert(voie(1).startsWith("CREATE TABLE voie ("))
    assert(voie.contains("TRUNCATE voie"))
    assert(voie.contains("ANALYZE voie"))
    val printed = out.toString("UTF-8")
    assert(printed.contains("-- voie"))
    assert(printed.contains("-- direction"))
    assert(printed.contains("CREATE TABLE voie ("))
  }

  test("CLI live load: fantoir lands in embedded Derby, counts match") {
    System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")
    val path = fantoirFixture()
    val url = "jdbc:derby:memory:clismoke;create=true"
    Pipelines.registerDialect("derby", DerbyDialect)

    Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream())) {
      Main.run(spark, Array("-s", "fantoir", "-r", "derby", "-p", path,
        "--jdbc-url", url))
    }

    val props = new java.util.Properties()
    def count(t: String): Long =
      spark.read.jdbc(url, t, props).count()
    assert(count("voie") == 1L)
    assert(count("direction") == 1L)
    assert(count("commune") == 0L)

    // the loaded row carries the PARSED content: the nature-de-voie
    // code ("LOT") was sliced off into its own column, leaving the
    // bare libelle
    val row = spark.read.jdbc(url, "voie", props)
      .select("LIBELLE_VOIE", "CODE_NATURE_DE_VOIE").collect().head
    assert(row.getString(0).trim == "BELLEVUE")
    assert(row.getString(1).trim == "LOT")
  }

  test("CLI rejects an unknown rdbms with a usage error") {
    intercept[IllegalArgumentException] {
      Pipelines.dialect("no-such-engine")
    }
  }
}
