package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FANTOIR fixed-width source (S3/S4/F1/D1 in SURVEY.md §2.a).
  *
  * One flat file interleaves 4 record types, classified positionally
  * (behavior from `/root/reference/datagouv_tools/fantoir.py:388-396`):
  * byte 1 == NUL → header, byte 4 == ' ' → direction, byte 8 == ' ' →
  * commune, else voie. Trailer lines start "9999999999" and are dropped
  * (`fantoir.py:440-441`). Field layouts are 1-based (start, length)
  * slices, trimmed; filler columns never materialize (Catalyst prunes
  * them because they are simply not selected).
  *
  * The reference dispatches one sequential read into 4 temp files /
  * queues (`import_fantoir.py:109-206`); here the classified Dataset is
  * cached once and filtered 4× — Spark's stage parallelism replaces the
  * hand-rolled producer/consumer threads, and the single cached pass
  * replaces the temp-file spill.
  */
object Fantoir {

  /** One fixed-width field: 1-based start offset and length. */
  final case class FixedField(name: String, start: Int, length: Int)

  final case class RecordFormat(name: String, fields: Seq[FixedField]) {
    /** Projection of a raw-line column into trimmed typed columns. */
    def projection(line: Column): Seq[Column] =
      fields.map(f => trim(substring(line, f.start, f.length)).as(f.name))
  }

  val header: RecordFormat = RecordFormat("header", Seq(
    FixedField("libelle_du_centre_de_production_du_fichier", 12, 25),
    FixedField("date_de_situation_du_fichier", 37, 8),
    FixedField("date_de_production_du_fichier", 45, 8)))

  val direction: RecordFormat = RecordFormat("direction", Seq(
    FixedField("code_departement", 1, 2),
    FixedField("code_direction", 3, 1),
    FixedField("libelle_direction", 12, 30)))

  val commune: RecordFormat = RecordFormat("commune", Seq(
    FixedField("code_departement", 1, 2),
    FixedField("code_direction", 3, 1),
    FixedField("code_commune", 4, 3),
    FixedField("cle_rivoli", 11, 1),
    FixedField("libelle_commune", 12, 30),
    FixedField("type_de_la_commune", 43, 1),
    FixedField("caractere_rur", 46, 1),
    FixedField("caractere_de_population", 50, 1),
    FixedField("population_reelle", 53, 7),
    FixedField("population_a_part", 60, 7),
    FixedField("population_fictive", 67, 7),
    FixedField("caractere_dannulation", 74, 1),
    FixedField("date_dannulation", 75, 7),
    FixedField("date_de_creation_de_larticle", 82, 7)))

  val voie: RecordFormat = RecordFormat("voie", Seq(
    FixedField("code_departement", 1, 2),
    FixedField("code_direction", 3, 1),
    FixedField("code_commune", 4, 3),
    FixedField("identifiant_de_la_voie_dans_la_commune", 7, 4),
    FixedField("cle_rivoli", 11, 1),
    FixedField("code_nature_de_voie", 12, 4),
    FixedField("libelle_voie", 16, 26),
    FixedField("type_de_la_commune", 43, 1),
    FixedField("caractere_rur", 46, 1),
    FixedField("caractere_de_voie", 49, 1),
    FixedField("caractere_de_population", 50, 1),
    FixedField("population_a_part", 60, 7),
    FixedField("population_fictive", 67, 7),
    FixedField("caractere_dannulation", 74, 1),
    FixedField("date_dannulation", 75, 7),
    FixedField("date_de_creation_de_larticle", 82, 7),
    FixedField("code_identifiant_majic_de_la_voie", 104, 5),
    FixedField("type_de_voie", 109, 1),
    FixedField("caractere_du_lieu_dit", 110, 1),
    FixedField(
      "dernier_mot_entierement_alphabetique_du_libelle_de_la_voie", 113, 8)))

  val formats: Seq[RecordFormat] = Seq(header, direction, commune, voie)

  /** Record-type classifier over a raw-line column (S3). */
  def recordType(line: Column): Column =
    when(substring(line, 1, 1) === "\u0000", "header")
      .when(substring(line, 4, 1) === " ", "direction")
      .when(substring(line, 8, 1) === " ", "commune")
      .otherwise("voie")

  /** True for the end-of-file sentinel rows (F1). */
  def isTrailer(line: Column): Column =
    substring(line, 1, 10) === "9999999999"

  /** Read a raw FANTOIR text file and classify each line. */
  def readClassified(spark: SparkSession, path: String): DataFrame =
    spark.read.option("encoding", "ISO-8859-1").text(path)
      .filter(!isTrailer(col("value")))
      .withColumn("record_type", recordType(col("value")))

  /** Single-pass dispatch (D1): classify once, cache, project 4 typed
    * DataFrames. Caller should unpersist the `_classified` frame when done.
    */
  def dispatch(spark: SparkSession, path: String)
      : Map[String, DataFrame] = {
    val classified = readClassified(spark, path).cache()
    formats.map { fmt =>
      fmt.name -> classified
        .filter(col("record_type") === fmt.name)
        .select(fmt.projection(col("value")): _*)
    }.toMap + ("_classified" -> classified)
  }

  /** Dictionary lookup with pass-through for unknown codes (L1):
    * `coalesce(map(code), code)` over a compile-time literal map — a
    * broadcast-free map-side lookup (the 190-entry map travels inside the
    * serialized expression, no shuffle, no join).
    */
  def natureVoieLabel(code: Column): Column = {
    val m = typedLit(NatureVoie.labelByCode)
    coalesce(element_at(m, code), code)
  }

  /** Inverse lookup: label → code, pass-through when unknown. */
  def natureVoieCode(label: Column): Column = {
    val m = typedLit(NatureVoie.codeByLabel)
    coalesce(element_at(m, label), label)
  }
}
