package graft.schema

import org.apache.spark.sql.types._

/** Sink-side SQL data model (SURVEY.md §1.1).
  *
  * Spark's `StructType` carries name/type/nullable/metadata but not the
  * sink concerns the reference's model has — ordinal rank, DDL comments,
  * declared lengths, and index requests
  * (`/root/reference/datagouv_tools/sql/generic.py:38-118`). This model
  * holds those and renders to both a `StructType` (engine side) and DDL
  * (sink side).
  */
final case class SqlFieldDef(
    tableName: String,
    fieldName: String,
    sqlType: SqlTypeDef,
    rank: Int = 0,
    comment: String = "",
    length: Int = 0) {

  def process(f: String => String): SqlFieldDef =
    copy(tableName = f(tableName), fieldName = f(fieldName))

  def toStructField: StructField = {
    val mb = new MetadataBuilder().putLong("rank", rank.toLong)
    if (comment.nonEmpty) mb.putString("comment", comment)
    if (length > 0) mb.putLong("length", length.toLong)
    StructField(fieldName, sqlType.sparkType, nullable = true, mb.build())
  }
}

/** An index request on one column; pure sink metadata (Spark has no
  * engine-side indexes — these become `CREATE INDEX` over JDBC after the
  * write, K5 in SURVEY.md §2.a).
  */
final case class SqlIndexDef(
    tableName: String,
    fieldName: String,
    indexType: SqlIndexType) {

  def process(f: String => String): SqlIndexDef =
    copy(tableName = f(tableName), fieldName = f(fieldName))

  /** `{field}_{table}_idx`, vowels stripped from both parts when the
    * combined length exceeds 64 (matches the reference's name mangling,
    * `generic.py:95-107`).
    */
  def name: String = {
    def strip(s: String) = s.filterNot("aeiou".contains(_))
    val (t, f) =
      if (fieldName.length + tableName.length > 64)
        (strip(tableName), strip(fieldName))
      else (tableName, fieldName)
    s"${f}_${t}_idx"
  }
}

final case class SqlTableDef(
    name: String,
    fields: Seq[SqlFieldDef],
    indices: Seq[SqlIndexDef]) {

  /** Columns are order-significant: sorted by rank before rendering. */
  def sorted: SqlTableDef = copy(fields = fields.sortBy(_.rank))

  def schema: StructType = StructType(fields.map(_.toStructField))

  def process(f: String => String): SqlTableDef =
    SqlTableDef(f(name), fields.map(_.process(f)), indices.map(_.process(f)))
}

/** DDL-renderable SQL type, mapped to its Spark DataType (SURVEY.md §1.3). */
final case class SqlTypeDef(ddl: String, sparkType: DataType)

object SqlTypes {
  val SMALLINT = SqlTypeDef("smallint", ShortType)
  val INTEGER = SqlTypeDef("integer", IntegerType)
  val BIGINT = SqlTypeDef("bigint", LongType)
  val DECIMAL = SqlTypeDef("decimal", DecimalType(38, 18))
  val NUMERIC = SqlTypeDef("numeric", DecimalType(38, 18))
  val MONEY = SqlTypeDef("money", DecimalType(38, 4))
  val REAL = SqlTypeDef("real", FloatType)
  val DOUBLE_PRECISION = SqlTypeDef("double precision", DoubleType)
  val SERIAL = SqlTypeDef("serial", IntegerType)
  val BIGSERIAL = SqlTypeDef("bigserial", LongType)
  val VARCHAR = SqlTypeDef("varchar", StringType)
  val CHAR = SqlTypeDef("char", StringType)
  val TEXT = SqlTypeDef("text", StringType)
  val BYTEA = SqlTypeDef("bytea", BinaryType)
  val TIMESTAMP = SqlTypeDef("timestamp", TimestampType)
  val DATE = SqlTypeDef("date", DateType)
  val TIME = SqlTypeDef("time", StringType) // Spark has no time-of-day type
  val BOOLEAN = SqlTypeDef("boolean", BooleanType)
}

sealed abstract class SqlIndexType(val ddl: String)
object SqlIndexType {
  case object BTree extends SqlIndexType("btree")
  case object Hash extends SqlIndexType("hash")
  case object Gist extends SqlIndexType("gist")
  case object SpGist extends SqlIndexType("spgist")
  case object Gin extends SqlIndexType("gin")
}

/** CSV wire dialect for bulk-copy statements (mirrors the stdlib `Dialect`
  * fields the reference's providers consume).
  */
final case class CsvDialect(
    delimiter: Char = ',',
    quoteChar: Char = '"',
    doubleQuote: Boolean = true,
    escapeChar: Char = '\\')

object CsvDialect {
  /** The reference's FANTOIR intermediate dialect: tab-delimited,
    * backspace quote (`fantoir.py:417-423`).
    */
  val fantoir: CsvDialect = CsvDialect(delimiter = '\t', quoteChar = '\b')
  val unix: CsvDialect = CsvDialect()
}
