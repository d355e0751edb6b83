package graft.sinks

import java.nio.charset.Charset
import java.nio.file.Files
import java.sql.DriverManager

import graft.schema.{CsvDialect, SqlTableDef}

/** One partition's native bulk-load channel (reference K2/K3): receives
  * the partition's CSV lines (header first) on an executor and drives
  * the DBMS's bulk command over a fresh connection. Implementations are
  * Serializable — they ship inside the `foreachPartition` closure of
  * [[JdbcSink.writeTableBulk]].
  *
  * This is the Spark-shaped analog of the reference's
  * `copy_stream`/`copy_path` executors (`generic.py:228-255`): where the
  * reference pipes ONE file through ONE cursor, each Spark partition
  * opens its own channel, so sink throughput scales with
  * `numPartitions` instead of a single client pipe.
  */
trait CopyChannel extends Serializable {

  /** The bulk statement as it will execute, for driver-side transcript
    * logging (file-bridged loads show a placeholder spill path).
    */
  def describe(table: SqlTableDef): String

  /** Load one partition. `lines` yields the header line then data rows.
    * Returns rows loaded (-1 when the DBMS doesn't report a count).
    */
  def copyIn(url: String, props: java.util.Properties, table: SqlTableDef,
             lines: Iterator[String]): Long
}

/** `Reader` view over CSV lines, newline-joined — what PostgreSQL's
  * `CopyManager.copyIn(sql, reader)` consumes. Streams; never holds the
  * partition in memory.
  */
private[graft] final class LinesReader(lines: Iterator[String])
    extends java.io.Reader {
  private var cur: String = _
  private var pos = 0

  override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (cur == null) {
      if (!lines.hasNext) return -1
      cur = lines.next() + "\n"
      pos = 0
    }
    val n = math.min(len, cur.length - pos)
    cur.getChars(pos, pos + n, cbuf, off)
    pos += n
    if (pos == cur.length) cur = null
    n
  }

  override def close(): Unit = ()
}

/** PostgreSQL `COPY … FROM STDIN` executed through the pgjdbc
  * `CopyManager` (the reference's flagship bulk path,
  * `postgresql.py:112-118`, ~10× batched INSERT). The pgjdbc classes are
  * loaded reflectively: the driver jar is a runtime dependency of the
  * cluster, not a compile-time dependency of this library.
  */
final case class PgCopyChannel(encoding: String = "UTF-8",
                               csv: CsvDialect = CsvDialect.unix)
    extends CopyChannel {

  override def describe(table: SqlTableDef): String =
    PostgresDialect.copyStream(table, encoding, csv).head

  override def copyIn(url: String, props: java.util.Properties,
                      table: SqlTableDef,
                      lines: Iterator[String]): Long = {
    val conn = DriverManager.getConnection(url, props)
    try {
      val baseCls = Class.forName("org.postgresql.core.BaseConnection")
      val mgrCls = Class.forName("org.postgresql.copy.CopyManager")
      val base = conn.unwrap(baseCls.asInstanceOf[Class[AnyRef]])
      val mgr = mgrCls.getConstructor(baseCls)
        .newInstance(base.asInstanceOf[Object])
      mgrCls.getMethod("copyIn", classOf[String], classOf[java.io.Reader])
        .invoke(mgr, describe(table), new LinesReader(lines))
        .asInstanceOf[java.lang.Long].longValue()
    } finally conn.close()
  }
}

object MariaDbLoadChannel {
  /** Default statement runner: plain JDBC `Statement.execute`. */
  val jdbcRun: (String, java.util.Properties, String) => Long = {
    (url, props, sql) =>
      val conn = DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try { st.execute(sql); st.getUpdateCount.toLong }
        finally st.close()
      } finally conn.close()
  }
}

/** MariaDB `LOAD DATA [LOCAL] INFILE` with the stream→temp-file bridge
  * (`generic.py:240-255` + `mariadb.py:33-47`): the partition's lines
  * spill to an executor-local CSV, the rendered LOAD DATA statement
  * points at that file, and the spill is removed afterwards. `local`
  * (default) renders `LOCAL INFILE` — the executor's file system is the
  * CLIENT side of the connection, which is exactly the reference's
  * temp-file situation; non-LOCAL requires the file visible to the
  * server.
  *
  * `run` is the statement executor, injectable for transcript tests;
  * production uses [[MariaDbLoadChannel.jdbcRun]].
  */
final case class MariaDbLoadChannel(
    encoding: String = "UTF-8",
    csv: CsvDialect = CsvDialect.unix,
    local: Boolean = true,
    run: (String, java.util.Properties, String) => Long =
      MariaDbLoadChannel.jdbcRun)
    extends CopyChannel {

  private def render(table: SqlTableDef, path: String): String = {
    val sql = MariaDbDialect.copyPath(table, path, encoding, csv).head
    if (local) sql.replaceFirst("^LOAD DATA INFILE", "LOAD DATA LOCAL INFILE")
    else sql
  }

  override def describe(table: SqlTableDef): String =
    render(table, "<partition-spill>.csv")

  override def copyIn(url: String, props: java.util.Properties,
                      table: SqlTableDef,
                      lines: Iterator[String]): Long = {
    val tmp = Files.createTempFile("graft_load_", ".csv")
    try {
      val w = Files.newBufferedWriter(tmp, Charset.forName(encoding))
      try lines.foreach { l => w.write(l); w.write('\n') }
      finally w.close()
      run(url, props, render(table, tmp.toString))
    } finally Files.deleteIfExists(tmp)
  }
}
