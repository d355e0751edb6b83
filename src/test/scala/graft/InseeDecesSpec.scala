package graft

import graft.sources.InseeDeces

class InseeDecesSpec extends SparkSpec {
  import spark.implicits._

  /** Build a fixed-offset line per FIXTURES.md §4. */
  private def line(nomPrenoms: String, sexe: String, dateNaiss: String,
                   codeLieuNaiss: String, communeNaiss: String,
                   paysNaiss: String, dateDeces: String,
                   codeLieuDeces: String, noActe: String): String =
    nomPrenoms.padTo(80, ' ') + sexe + dateNaiss + codeLieuNaiss +
      communeNaiss.padTo(30, ' ') + paysNaiss.padTo(30, ' ') + dateDeces +
      codeLieuDeces + noActe.padTo(9, ' ')

  test("parse splits nom, pivots 8 prenoms, maps sex, lenient dates") {
    val l1 = line("DUPONT*JEAN PIERRE MARIE/", "1", "19230512", "75101",
      "PARIS", "FRANCE", "20200301", "75102", "123")
    val l2 = line("MARTIN*ANNE/", "2", "00000000", "99999", "LYON",
      "FRANCE", "20210715", "69001", "456")
    val l3 = line("X*Y/", "9", "19991301", "00000", "", "", "20220101",
      "11111", "789")

    val df = InseeDeces.parse(Seq(l1, l2, l3).toDF("value"))
    val rows = df.orderBy("no_acte_deces").collect()

    val r1 = rows.find(_.getAs[String]("nom") == "DUPONT").get
    assert(r1.getAs[String]("prenom1") == "JEAN")
    assert(r1.getAs[String]("prenom2") == "PIERRE")
    assert(r1.getAs[String]("prenom3") == "MARIE")
    assert(r1.isNullAt(r1.fieldIndex("prenom4")))
    assert(r1.getAs[String]("sexe") == "M")
    assert(r1.getAs[java.sql.Date]("date_naiss").toString == "1923-05-12")
    assert(r1.getAs[java.sql.Date]("date_deces").toString == "2020-03-01")
    assert(r1.getAs[String]("commune_naiss") == "PARIS")

    val r2 = rows.find(_.getAs[String]("nom") == "MARTIN").get
    assert(r2.getAs[String]("sexe") == "F")
    assert(r2.isNullAt(r2.fieldIndex("date_naiss"))) // all-zero date
    assert(r2.getAs[String]("prenom1") == "ANNE")
    assert(r2.isNullAt(r2.fieldIndex("prenom2")))

    val r3 = rows.find(_.getAs[String]("nom") == "X").get
    assert(r3.getAs[String]("sexe") == "UNKNOWN")
    assert(r3.isNullAt(r3.fieldIndex("date_naiss"))) // month 13 invalid
  }
}
