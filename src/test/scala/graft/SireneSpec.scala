package graft

import graft.schema.{SqlIndexType, SqlTypes}
import graft.sources.{Sirene, ZipCsv}

class SireneSpec extends SparkSpec {
  import spark.implicits._

  private def dessinDf = Seq(
    ("siren", "Numéro SIREN", "9", "Texte", "1"),
    ("dateCreationEtablissement", "Date de création", "10", "Date", "2"),
    ("anneeEffectifs", "Année de validité", "4", "Date", "3"),
    ("numeroVoieEtablissement", "Numéro de voie", "4", "Numérique", "4"),
    ("activitePrincipale", "Activité principale", "6", "Liste de codes", "5"),
    ("nombrePeriodes", "Nombre de périodes", "2", "Numérique", "6"),
  ).toDF("Nom", "Libellé", "Longueur", "Type", "Ordre")

  test("dessin parse: types, patches, rank order") {
    val fields = Sirene.parseDessin("StockEtablissement", dessinDf)
    assert(fields.map(_.fieldName) == Seq("siren",
      "dateCreationEtablissement", "anneeEffectifs", "numeroVoieEtablissement",
      "activitePrincipale", "nombrePeriodes"))
    val byName = fields.map(f => f.fieldName -> f.sqlType).toMap
    assert(byName("siren") == SqlTypes.TEXT)
    assert(byName("dateCreationEtablissement") == SqlTypes.DATE) // len 10
    assert(byName("anneeEffectifs") == SqlTypes.TEXT) // Date with len 4
    assert(byName("numeroVoieEtablissement") == SqlTypes.TEXT) // forced
    assert(byName("nombrePeriodes") == SqlTypes.NUMERIC)
    assert(fields.find(_.fieldName == "siren").get.comment == "Numéro SIREN")
  }

  test("index rules: hash on siren*/siret*, btree extras") {
    val fields = Sirene.parseDessin("StockEtablissement", dessinDf)
    val ix = Sirene.indices("StockEtablissement", fields)
    assert(ix.map(i => (i.fieldName, i.indexType)) ==
      Seq(("siren", SqlIndexType.Hash)))
  }

  test("tableDef is snake_cased") {
    val table = Sirene.tableDef("StockEtablissement", dessinDf)
    assert(table.name == "stock_etablissement")
    assert(table.fields.map(_.fieldName).contains(
      "numero_voie_etablissement"))
    assert(table.indices.head.name == "siren_stock_etablissement_idx")
  }

  test("zip csv roundtrip with cast") {
    val dir = java.nio.file.Files.createTempDirectory("sirene")
    val zipPath = dir.resolve("StockTest_utf8.zip")
    val csv = "siren,dateCreationEtablissement,anneeEffectifs," +
      "numeroVoieEtablissement,activitePrincipale,nombrePeriodes\n" +
      "000325175,2000-09-26,2020,5,3212ZZ,3\n" +
      "000325176,1999-01-02,,,4321AA,\n"
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("data.csv"))
    zos.write(csv.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()

    val table = Sirene.tableDef("StockTest", dessinDf)
    val raw = ZipCsv.readCsv(spark, zipPath.toString)
    val df = Sirene.castTo(raw, table)
    assert(df.columns.toSeq == Seq("siren", "date_creation_etablissement",
      "annee_effectifs", "numero_voie_etablissement",
      "activite_principale", "nombre_periodes"))
    val rows = df.orderBy("siren").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[java.sql.Date]("date_creation_etablissement")
      .toString == "2000-09-26")
    assert(rows(0).getAs[java.math.BigDecimal]("nombre_periodes")
      .intValue == 3)
    assert(rows(1).isNullAt(rows(1).fieldIndex("nombre_periodes")))
  }

  test("lenient boolean accepts the reference token set (sql_type.py:77-83)") {
    import graft.schema.{SqlFieldDef, SqlTableDef}
    val raw = Seq("true", "TRUE", " yes ", "on", "ON", "1",
      "false", "No", "off", " OFF", "0", "maybe", "2", "")
      .toDF("flag")
    val table = SqlTableDef("t",
      Seq(SqlFieldDef("t", "flag", SqlTypes.BOOLEAN)), Seq.empty)
    val got = Sirene.castTo(raw, table)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
      .toSeq
    val t = Some(true); val f = Some(false)
    assert(got == Seq(t, t, t, t, t, t, f, f, f, f, f, None, None, None))
  }

  test("data source discovery pairs zips with dessins, skips orphans") {
    val dir = java.nio.file.Files.createTempDirectory("disco")
    java.nio.file.Files.write(dir.resolve("StockA_utf8.zip"),
      Array.emptyByteArray)
    java.nio.file.Files.write(dir.resolve("dessinstocka.csv"),
      Array.emptyByteArray)
    java.nio.file.Files.write(dir.resolve("StockB_utf8.zip"),
      Array.emptyByteArray) // no dessin → skipped
    val sources = Sirene.dataSources(dir)
    assert(sources.map(_._1) == Seq("StockA"))
  }

  test("full sirene pipeline dry run over a discovered source") {
    val dir = java.nio.file.Files.createTempDirectory("sirene_e2e")
    val csv = "siren,dateCreationEtablissement,anneeEffectifs," +
      "numeroVoieEtablissement,activitePrincipale,nombrePeriodes\n" +
      "000325175,2000-09-26,2020,5,3212ZZ,3\n"
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("StockTest_utf8.zip")))
    zos.putNextEntry(new java.util.zip.ZipEntry("data.csv"))
    zos.write(csv.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    java.nio.file.Files.write(dir.resolve("dessinstocktest.csv"),
      ("Nom,Libell\u00e9,Longueur,Type,Ordre\n" +
        "siren,Num\u00e9ro SIREN,9,Texte,1\n" +
        "dateCreationEtablissement,Date de cr\u00e9ation,10,Date,2\n" +
        "anneeEffectifs,Ann\u00e9e,4,Date,3\n" +
        "numeroVoieEtablissement,Num\u00e9ro de voie,4,Num\u00e9rique,4\n" +
        "activitePrincipale,Activit\u00e9,6,Liste de codes,5\n" +
        "nombrePeriodes,Nombre,2,Num\u00e9rique,6\n").getBytes("UTF-8"))

    val transcripts = graft.pipelines.Pipelines.importSirene(
      spark, dir.toString, "pg")
    assert(transcripts.keySet == Set("StockTest"))
    val t = transcripts("StockTest")
    assert(t.head == "DROP TABLE IF EXISTS stock_test")
    assert(t(1).contains("date_creation_etablissement date"))
    assert(t(1).contains("-- Num\u00e9ro SIREN")) // comment preserved
    assert(t.exists(_.contains("USING hash(siren)")))
    assert(t.contains("ANALYZE stock_test"))
  }
}
