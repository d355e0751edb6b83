package graft

import graft.functions.NameUtil._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's doctest spec for name normalization
  * (`/root/reference/datagouv_tools/util.py:31-118`).
  */
class NameUtilSpec extends AnyFunSuite {

  test("splitOnCat default ignores upper→lower humps") {
    assert(splitOnCat("LoremIpsum") == Seq("Lorem", "Ipsum"))
  }

  test("splitOnCat with no exceptions splits every transition") {
    assert(splitOnCat("LoremIpsum", Seq.empty) ==
      Seq("L", "orem", "I", "psum"))
  }

  test("splitOnCat wildcard before digits") {
    assert(splitOnCat("Lorem2Ipsum", Seq(None -> Some("Nd"))) ==
      Seq("L", "orem2", "I", "psum"))
  }

  test("splitOnCat ignore-all never splits") {
    assert(splitOnCat("LoremIpsum", Seq((None, None))) == Seq("LoremIpsum"))
  }

  test("toSnake basics") {
    assert(toSnake("LoremIpsum") == "lorem_ipsum")
    assert(toSnake("Lorem2Ipsum") == "lorem_2_ipsum")
    assert(toSnake("siren") == "siren")
    assert(toSnake("numeroVoieEtablissement") == "numero_voie_etablissement")
    assert(toSnake("CamelCaseTable") == "camel_case_table")
  }

  test("toSnake is idempotent (seeded-random property)") {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.frequency(
      8 -> org.scalacheck.Gen.alphaNumChar,
      1 -> org.scalacheck.Gen.const('_'),
      1 -> org.scalacheck.Gen.oneOf('é', 'É', ' ', '-', '’')))
      .map(_.mkString)
    val prop = org.scalacheck.Prop.forAll(gen) { s =>
      s.isEmpty || toSnake(toSnake(s)) == toSnake(s)
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, result.status.toString)
  }

  test("sanitize strips accents and non-ascii") {
    assert(sanitize("Code Départ’ement") == "Code Departement")
    assert(sanitize("plain") == "plain")
  }

  test("toStandard") {
    assert(toStandard("Code Départ’ement") == "code_departement")
    assert(toStandard("Libellé voie") == "libelle_voie")
  }
}
