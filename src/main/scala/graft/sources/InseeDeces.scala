package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INSEE deceased-persons fixed-offset file (S5/V1 in SURVEY.md §2.a).
  *
  * Each line carries fixed-offset fields; the first 80 chars hold
  * `NOM*PRENOM1 PRENOM2 .../` split by regex, the prenom list is pivoted
  * into 8 null-padded columns (behavior from
  * `/root/reference/datagouv_tools/fichier_personnes_decedees.py:77-191`).
  * Everything is column expressions — whole-stage-codegen'd, no UDFs.
  */
object InseeDeces {

  /** 0-based (start, end) offsets per raw field (FIXTURES.md §4). */
  private val offsets = Seq(
    ("nom_prenoms", 0, 80), ("sexe", 80, 81), ("date_naiss", 81, 89),
    ("code_lieu_naiss", 89, 94), ("commune_naiss", 94, 124),
    ("pays_naiss", 124, 154), ("date_deces", 154, 162),
    ("code_lieu_deces", 162, 167), ("no_acte_deces", 167, 176))

  private val namesRegex = "^([^*]+)\\*([^/]+)/?\\s*$"

  /** sex code 1→M, 2→F, else UNKNOWN (note: the reference aliases
    * UNKNOWN to the same code as F, `fichier_personnes_decedees.py:49-52`
    * — a bug we do not reproduce).
    */
  def sexLabel(code: Column): Column =
    when(code === "1", "M").when(code === "2", "F").otherwise("UNKNOWN")

  /** Lenient 8-digit AAAAMMJJ date: invalid or non-numeric → null
    * (the reference degrades to zeros; null is the Spark-idiomatic
    * equivalent, recorded as a deviation per SURVEY.md §7.4).
    */
  def lenientDate(raw: Column): Column =
    try_to_date(nullif(raw, lit("00000000")), "yyyyMMdd")

  /** Parse raw lines into the full typed layout. */
  def parse(lines: DataFrame): DataFrame = {
    val value = col("value")
    val sliced = offsets.map { case (name, start, end) =>
      trim(substring(value, start + 1, end - start)).as(name)
    }
    val df = lines.select(sliced: _*)
    val nom = regexp_extract(col("nom_prenoms"), namesRegex, 1)
    val prenoms = split(trim(regexp_extract(col("nom_prenoms"), namesRegex, 2)),
      "\\s+")
    // V1: pivot the prenom list into 8 fixed, null-padded columns.
    val prenomCols = (1 to 8).map(i =>
      try_element_at(prenoms, lit(i)).as(s"prenom$i"))
    df.select(Seq(nom.as("nom")) ++ prenomCols ++ Seq(
      sexLabel(col("sexe")).as("sexe"),
      lenientDate(col("date_naiss")).as("date_naiss"),
      col("code_lieu_naiss"),
      col("commune_naiss"),
      col("pays_naiss"),
      lenientDate(col("date_deces")).as("date_deces"),
      col("code_lieu_deces"),
      col("no_acte_deces")): _*)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
