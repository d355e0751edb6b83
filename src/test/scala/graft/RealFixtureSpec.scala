package graft

import graft.sources.{Fantoir, Sirene, ZipCsv}
import org.apache.spark.sql.functions._

/** Integration against the reference's own reduced real-data fixtures
  * (1000-line head samples of the actual data.gouv.fr files,
  * `/root/reference/tests/resources`). Read in place (read-only data
  * fixtures); suites cancel gracefully if the tree is absent.
  */
class RealFixtureSpec extends SparkSpec {

  private val fantoirZip = new java.io.File(
    "/root/reference/tests/resources/fantoir/" +
      "Fichier national FANTOIR (situation octobre 2019)_reduit.zip")
  private val sireneDir = new java.io.File(
    "/root/reference/tests/resources/sirene")

  test("real FANTOIR sample: classify, dispatch, golden first voie row") {
    assume(fantoirZip.exists())
    // single-entry zip of a latin-1 fixed-width file
    val tmp = java.nio.file.Files.createTempDirectory("fantoir_real")
    val zin = new java.util.zip.ZipInputStream(
      new java.io.FileInputStream(fantoirZip))
    zin.getNextEntry
    val extracted = tmp.resolve("fantoir.txt")
    java.nio.file.Files.copy(zin, extracted)
    zin.close()

    val parts = Fantoir.dispatch(spark, extracted.toString)
    val voie = parts("voie")
    assert(voie.count() > 0)
    // golden row from the reference's own test
    // (/root/reference/tests/test_fantoir.py:60-66, stripped per to_row)
    val first = voie.limit(1).collect()(0).toSeq
    assert(first == Seq("01", "0", "001", "A008", "W", "LOT", "BELLEVUE",
      "N", "3", "0", "", "0000000", "0000000", "", "0000000", "2001351",
      "00059", "2", "", "BELLEVUE"))
    // every record lands in exactly one type
    val total = Fantoir.formats.map(f => parts(f.name).count()).sum
    val classified = parts("_classified").count()
    assert(total == classified)
    parts("_classified").unpersist()

    // L1 over real codes: every voie nature code resolves or passes through
    val labeled = voie.select(
      Fantoir.natureVoieLabel(col("code_nature_de_voie")).as("label"))
    assert(labeled.filter(col("label") === "LOT").count() == 0) // resolved
    assert(labeled.count() == voie.count())
  }

  test("real SIRENE sample: discover, parse dessin, read zip, cast") {
    assume(sireneDir.exists())
    val sources = Sirene.dataSources(sireneDir.toPath)
    // discovery pairs each *_utf8.zip with its dessin (the reference's
    // fixtures use a _reduit suffix on the dessin, so pair manually here)
    val zip = new java.io.File(sireneDir,
      "StockEtablissement_reduit_utf8.zip")
    val dessin = new java.io.File(sireneDir,
      "dessinstocketablissement_reduit.csv")
    assume(zip.exists() && dessin.exists())

    val dessinDf = spark.read.option("header", "true").csv(dessin.toString)
    val table = Sirene.tableDef("StockEtablissement_reduit", dessinDf)
    assert(table.name == "stock_etablissement_reduit")
    assert(table.fields.nonEmpty)
    assert(table.indices.exists(_.fieldName.startsWith("siren")))

    val raw = ZipCsv.readCsv(spark, zip.toString)
    assert(raw.count() > 0)
    val typed = Sirene.castTo(raw, table)
    assert(typed.columns.length == table.fields.length)
    assert(typed.columns.forall(c => c == graft.functions.NameUtil.toSnake(c)))
    // the date patch holds on real data: creation date is DATE typed
    val dateFields = table.fields.filter(_.sqlType == graft.schema.SqlTypes.DATE)
    assert(dateFields.nonEmpty)
    val sample = typed.select(dateFields.head.fieldName).na.drop().limit(1)
      .collect()
    assert(sample.isEmpty || sample(0).get(0).isInstanceOf[java.sql.Date])
    val _ = sources
  }
}
