package graft

import graft.sources.{Fantoir, NatureVoie}
import org.apache.spark.sql.functions._

/** Golden rows from the reference's own fixtures
  * (`/root/reference/tests/test_import_fantoir.py:183-192`,
  * `tests/test_fantoir.py:49-67`).
  */
class FantoirSpec extends SparkSpec {
  import spark.implicits._

  private val headerLine =
    ("\u0000" * 12) +
      "ENEVERS                  2019110120193080000000"
  private val directionLine =
    "010        AIN                                             " +
      "00000000000000 00000000000000"
  private val communeLine =
    "010001    WL'ABERGEMENT-CLEMENCIAT        N  3      0000825" +
      "00000000000000 00000001987001"
  private val voieLine =
    "010001A008WLOT BELLEVUE                   N  3  0          " +
      "00000000000000 00000002001351               000592   BELLEVUE"
  private val trailerLine = "9999999999999999999999999  END"

  test("record classification matches the reference sentinels") {
    val df = Seq(headerLine, directionLine, communeLine, voieLine)
      .toDF("value")
      .select(Fantoir.recordType(col("value")).as("t"))
    assert(df.as[String].collect().toSeq ==
      Seq("header", "direction", "commune", "voie"))
  }

  test("trailer sentinel rows are dropped") {
    val df = Seq(voieLine, trailerLine).toDF("value")
      .filter(!Fantoir.isTrailer(col("value")))
    assert(df.count() == 1)
  }

  test("voie projection extracts trimmed golden values") {
    val row = Seq(voieLine).toDF("value")
      .select(Fantoir.voie.projection(col("value")): _*)
      .collect()(0)
    val expected = Seq("01", "0", "001", "A008", "W", "LOT", "BELLEVUE",
      "N", "3", "0", "", "0000000", "0000000", "", "0000000", "2001351",
      "00059", "2", "", "BELLEVUE")
    assert(row.toSeq == expected)
  }

  test("direction projection") {
    val row = Seq(directionLine).toDF("value")
      .select(Fantoir.direction.projection(col("value")): _*)
      .collect()(0)
    assert(row.toSeq == Seq("01", "0", "AIN"))
  }

  test("commune projection") {
    val row = Seq(communeLine).toDF("value")
      .select(Fantoir.commune.projection(col("value")): _*)
      .collect()(0)
    assert(row.toSeq == Seq("01", "0", "001", "W",
      "L'ABERGEMENT-CLEMENCIAT", "N", "3", "", "0000825", "0000000",
      "0000000", "", "0000000", "1987001"))
  }

  test("nature voie dictionary lookups with pass-through") {
    assert(NatureVoie.labelByCode("RUE") == "RUE")
    assert(NatureVoie.labelByCode("SEN") == "SENTIER, SENTE")
    assert(NatureVoie.labelByCode("RPT") == "ROND-POINT")
    assert(NatureVoie.codeByLabel("SENTIER") == "SEN")
    assert(NatureVoie.codeByLabel("SENTE") == "SEN")

    val df = Seq("RUE", "SEN", "XYZ").toDF("code")
      .select(Fantoir.natureVoieLabel(col("code")).as("label"))
    assert(df.as[String].collect().toSeq ==
      Seq("RUE", "SENTIER, SENTE", "XYZ"))

    val inv = Seq("SENTIER", "RUE", "UNKNOWN THING").toDF("label")
      .select(Fantoir.natureVoieCode(col("label")).as("code"))
    assert(inv.as[String].collect().toSeq == Seq("SEN", "RUE",
      "UNKNOWN THING"))
  }

  test("dispatch routes each line to exactly one format") {
    val dir = java.nio.file.Files.createTempDirectory("fantoir").toString
    val path = s"$dir/fantoir.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      Seq(headerLine, directionLine, communeLine, voieLine, trailerLine)
        .mkString("\n").getBytes("ISO-8859-1"))
    val parts = Fantoir.dispatch(spark, path)
    assert(parts("header").count() == 1)
    assert(parts("direction").count() == 1)
    assert(parts("commune").count() == 1)
    assert(parts("voie").count() == 1)
    assert(parts("voie").columns.length == 20)
    parts("_classified").unpersist()
  }
}
