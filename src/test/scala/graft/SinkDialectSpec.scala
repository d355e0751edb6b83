package graft

import graft.schema._
import graft.sinks._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-SQL expectations ported from the reference's dialect tests
  * (`/root/reference/tests/sql/test_postgres.py`, `test_mariadb.py`,
  * `test_generic.py`).
  */
class SinkDialectSpec extends AnyFunSuite {

  private val f1 = SqlFieldDef("t", "f1", SqlTypes.TEXT, comment = "comment1")
  private val f2 = SqlFieldDef("t", "field_with_long_name2", SqlTypes.NUMERIC)
  private val f3 = SqlFieldDef("t", "f3", SqlTypes.TEXT, comment = "comment2")
  private val empty = SqlTableDef("t", Seq.empty, Seq.empty)

  test("drop table") {
    assert(PostgresDialect.dropTable(empty) == Seq("DROP TABLE IF EXISTS t"))
  }

  test("create empty table") {
    assert(PostgresDialect.createTable(empty) == Seq("CREATE TABLE t ()"))
  }

  test("create table: one commented field") {
    val t = SqlTableDef("t", Seq(f1), Seq.empty)
    assert(PostgresDialect.createTable(t) ==
      Seq("CREATE TABLE t (\n    f1 text -- comment1\n)"))
  }

  test("create table: aligned columns and comments") {
    val t = SqlTableDef("t", Seq(f1, f2, f3), Seq.empty)
    assert(PostgresDialect.createTable(t) == Seq(
      "CREATE TABLE t (\n" +
        "    f1                    text,    -- comment1\n" +
        "    field_with_long_name2 numeric,\n" +
        "    f3                    text    -- comment2\n" +
        ")"))
  }

  test("pg prepare/finalize copy") {
    assert(PostgresDialect.prepareCopy(empty) == Seq("TRUNCATE t"))
    assert(PostgresDialect.finalizeCopy(empty) == Seq("ANALYZE t"))
  }

  test("pg copy stream: default dialect") {
    assert(PostgresDialect.copyStream(empty, "utf-8", CsvDialect.unix) ==
      Seq("COPY t FROM STDIN WITH (FORMAT CSV, HEADER TRUE, " +
        "ENCODING 'UTF_8')"))
  }

  test("pg copy stream: custom dialect with C-escapes") {
    val dialect = CsvDialect(delimiter = '\t', quoteChar = '\'',
      doubleQuote = false, escapeChar = '\\')
    assert(PostgresDialect.copyStream(empty, "utf-8", dialect) ==
      Seq("COPY t FROM STDIN WITH (FORMAT CSV, HEADER TRUE, " +
        "ENCODING 'UTF_8', DELIMITER E'\t', ESCAPE E'\\\\', QUOTE E'\\'')"))
  }

  test("pg copy stream: fantoir dialect (tab + backspace quote)") {
    assert(PostgresDialect.copyStream(empty, "latin-1", CsvDialect.fantoir) ==
      Seq("COPY t FROM STDIN WITH (FORMAT CSV, HEADER TRUE, " +
        "ENCODING 'LATIN_1', DELIMITER E'\t', QUOTE E'\b')"))
  }

  test("pg index uses method") {
    val ix = SqlIndexDef("t", "f", SqlIndexType.Hash)
    assert(PostgresDialect.createIndex(empty, ix) == Seq(
      "DROP INDEX IF EXISTS f_t_idx",
      "CREATE INDEX f_t_idx ON t USING hash(f)"))
  }

  test("mariadb load data infile") {
    val t = SqlTableDef("table", Seq.empty, Seq.empty)
    assert(MariaDbDialect.copyPath(t, "path", "utf-8", CsvDialect.unix) ==
      Seq("LOAD DATA INFILE 'path'\n" +
        "INTO TABLE `table`\n" +
        "CHARACTER SET 'UTF8'\n" +
        "FIELDS TERMINATED BY ','\n" +
        "OPTIONALLY ENCLOSED BY '\"'\n" +
        "IGNORE 1 LINES"))
  }

  test("mariadb prefix index") {
    val t = SqlTableDef("table", Seq.empty, Seq.empty)
    val ix = SqlIndexDef("table", "field1", SqlIndexType.Hash)
    assert(MariaDbDialect.createIndex(t, ix) == Seq(
      "DROP INDEX IF EXISTS field1_table_idx ON table",
      "CREATE INDEX field1_table_idx ON table(field1(255))"))
  }

  test("index name mangles vowels when too long") {
    val short = SqlIndexDef("camel_case_table", "camel_case_field",
      SqlIndexType.Hash)
    assert(short.name == "camel_case_field_camel_case_table_idx")
    val long = SqlIndexDef("camel_case_table" * 4, "camel_case_field" * 4,
      SqlIndexType.Hash)
    assert(long.name == "cml_cs_fldcml_cs_fldcml_cs_fldcml_cs_fld_" +
      "cml_cs_tblcml_cs_tblcml_cs_tblcml_cs_tbl_idx")
  }

  test("index on wrong table is rejected") {
    val ix = SqlIndexDef("other", "f", SqlIndexType.Hash)
    intercept[IllegalArgumentException] {
      SqliteDialect.createIndex(empty, ix)
    }
  }

  test("insert all") {
    val t = SqlTableDef("t", Seq(f1, f2), Seq.empty)
    assert(SqliteDialect.insertAll(t) == "INSERT INTO t VALUES (?, ?)")
  }

  test("dry-run transcript sequences the full lifecycle") {
    val t = SqlTableDef("t", Seq(f1),
      Seq(SqlIndexDef("t", "f1", SqlIndexType.Hash)))
    val sink = new JdbcSink("jdbc:none", new java.util.Properties,
      PostgresDialect)
    val transcript = sink.dryRunTranscript(t)
    assert(transcript == Seq(
      "DROP TABLE IF EXISTS t",
      "CREATE TABLE t (\n    f1 text -- comment1\n)",
      "TRUNCATE t",
      "INSERT INTO t VALUES (?)",
      "ANALYZE t",
      "DROP INDEX IF EXISTS f1_t_idx",
      "CREATE INDEX f1_t_idx ON t USING hash(f1)"))
  }
}
