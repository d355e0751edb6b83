package graft.sinks

import graft.schema._

/** SQL generation per target RDBMS (K1–K6 in SURVEY.md §2.a).
  *
  * The reference splits this into `QueryProvider` (SQL strings) and
  * `QueryExecutor` (cursor calls) — `generic.py:121-283`; here the
  * provider side is a pure trait rendering SQL, and execution happens
  * either through [[JdbcSink]] (real JDBC) or [[DryRunExecutor]] (logged,
  * the analog of the reference's fake connection, `generic.py:286-324`).
  */
trait SinkDialect {

  def dropTable(table: SqlTableDef): Seq[String] =
    Seq(s"DROP TABLE IF EXISTS ${table.name}")

  /** Aligned CREATE TABLE with one `-- comment` per commented column. */
  def createTable(table: SqlTableDef): Seq[String] = {
    val fields = table.fields
    if (fields.isEmpty) return Seq(s"CREATE TABLE ${table.name} ()")
    val typeWidth = fields.map(_.sqlType.ddl.length).max
    val nameWidth = fields.map(_.fieldName.length).max
    val lines = fields.zipWithIndex.map { case (f, i) =>
      val comma = if (i < fields.length - 1) "," else ""
      val namePart = f.fieldName.padTo(nameWidth, ' ')
      val typePart = (f.sqlType.ddl + comma).padTo(typeWidth + comma.length, ' ')
      val base = s"    $namePart $typePart"
      if (f.comment.nonEmpty) s"$base -- ${f.comment}" else base
    }
    Seq((s"CREATE TABLE ${table.name} (" +: lines :+ ")").mkString("\n"))
  }

  def prepareCopy(table: SqlTableDef): Seq[String] = Seq.empty

  def insertAll(table: SqlTableDef): String = {
    val marks = Seq.fill(table.fields.size)("?").mkString(", ")
    s"INSERT INTO ${table.name} VALUES ($marks)"
  }

  def finalizeCopy(table: SqlTableDef): Seq[String] = Seq.empty

  def createIndex(table: SqlTableDef, index: SqlIndexDef): Seq[String] = {
    require(index.tableName == table.name)
    Seq(s"DROP INDEX IF EXISTS ${index.name}",
      s"CREATE INDEX ${index.name} ON ${table.name}(${index.fieldName})")
  }
}

/** PostgreSQL: TRUNCATE before COPY, `COPY … FROM STDIN WITH (FORMAT CSV,
  * …)` with C-style escaped option chars, ANALYZE after, `USING <method>`
  * indexes (`postgresql.py:35-76`).
  */
object PostgresDialect extends SinkDialect {

  override def prepareCopy(table: SqlTableDef): Seq[String] =
    Seq(s"TRUNCATE ${table.name}")

  /** C-style escape for single-char COPY options
    * (PostgreSQL string constants with C-style escapes).
    */
  private[sinks] def escapeChar(c: Char): String = c match {
    case '\\' => "E'\\\\'"
    case '\b' | '\f' | '\n' | '\r' | '\t' => s"E'$c'"
    case '\'' => "E'\\''"
    case other => s"'$other'"
  }

  def copyStream(table: SqlTableDef, encoding: String,
                 dialect: CsvDialect): Seq[String] = {
    val enc = encoding.replace("-", "_").toUpperCase
    val options = Seq.newBuilder[(String, String)]
    options += "FORMAT" -> "CSV"
    options += "HEADER" -> "TRUE"
    options += "ENCODING" -> s"'$enc'"
    if (dialect.delimiter != ',')
      options += "DELIMITER" -> escapeChar(dialect.delimiter)
    if (!dialect.doubleQuote)
      options += "ESCAPE" -> escapeChar(dialect.escapeChar)
    if (dialect.quoteChar != '"')
      options += "QUOTE" -> escapeChar(dialect.quoteChar)
    val optionsStr =
      options.result().map { case (k, v) => s"$k $v" }.mkString(", ")
    Seq(s"COPY ${table.name} FROM STDIN WITH ($optionsStr)")
  }

  override def finalizeCopy(table: SqlTableDef): Seq[String] =
    Seq(s"ANALYZE ${table.name}")

  override def createIndex(table: SqlTableDef,
                           index: SqlIndexDef): Seq[String] =
    Seq(s"DROP INDEX IF EXISTS ${index.name}",
      s"CREATE INDEX ${index.name} ON ${table.name} " +
        s"USING ${index.indexType.ddl}(${index.fieldName})")
}

/** MariaDB: `LOAD DATA INFILE` bulk path, prefix(255) indexes
  * (`mariadb.py:33-52`).
  */
object MariaDbDialect extends SinkDialect {

  def copyPath(table: SqlTableDef, path: String, encoding: String,
               dialect: CsvDialect): Seq[String] = {
    val enc = encoding.replace("-", "_").toUpperCase.replace("_", "")
    val lines = Seq.newBuilder[String]
    lines += s"LOAD DATA INFILE '$path'"
    lines += s"INTO TABLE `${table.name}`"
    lines += s"CHARACTER SET '$enc'"
    lines += s"FIELDS TERMINATED BY '${dialect.delimiter}'"
    lines += s"OPTIONALLY ENCLOSED BY '${dialect.quoteChar}'"
    if (!dialect.doubleQuote) lines += s"ESCAPED BY '${dialect.escapeChar}'"
    lines += "IGNORE 1 LINES"
    Seq(lines.result().mkString("\n"))
  }

  override def createIndex(table: SqlTableDef,
                           index: SqlIndexDef): Seq[String] =
    Seq(s"DROP INDEX IF EXISTS ${index.name} ON ${table.name}",
      s"CREATE INDEX ${index.name} ON " +
        s"${table.name}(${index.fieldName}(255))")
}

/** SQLite: no bulk path — "copy" degrades to batched INSERT
  * (`sqlite.py:58-68`); generic DDL otherwise.
  */
object SqliteDialect extends SinkDialect

/** Apache Derby (the embedded JVM database shipped with Spark): the
  * dialect that lets the full K1–K6 lifecycle run for REAL in tests —
  * DDL, `df.write.jdbc` batched inserts, index creation, read-back.
  * Derby has no `IF EXISTS` forms: DROP statements are omitted (tests
  * target a fresh in-memory database per run) and `CREATE INDEX` carries
  * no method clause.
  */
object DerbyDialect extends SinkDialect {
  override def dropTable(table: SqlTableDef): Seq[String] = Seq.empty
  /** Derby has no TEXT type; render it as max-width VARCHAR. */
  override def createTable(table: SqlTableDef): Seq[String] =
    super.createTable(table.copy(fields = table.fields.map { f =>
      if (f.sqlType.ddl == "text")
        f.copy(sqlType = f.sqlType.copy(ddl = "VARCHAR(32672)"))
      else f
    }))
  override def createIndex(table: SqlTableDef,
                           index: SqlIndexDef): Seq[String] = {
    require(index.tableName == table.name)
    Seq(s"CREATE INDEX ${index.name} ON ${table.name}(${index.fieldName})")
  }
}

/** Dry-run execution (X1): collects every statement instead of executing,
  * so pipelines can be golden-tested without a database.
  */
final class DryRunExecutor {
  private val log = Seq.newBuilder[String]
  def execute(queries: Seq[String]): Unit = queries.foreach(log += _)
  def statements: Seq[String] = log.result()
}
