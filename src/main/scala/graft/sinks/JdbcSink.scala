package graft.sinks

import java.sql.{Connection, DriverManager}

import graft.schema.SqlTableDef
import org.apache.spark.sql.DataFrame

/** JDBC table-load lifecycle (SURVEY.md §3): DROP/CREATE → prepare →
  * bulk write → finalize (ANALYZE) → indexes → commit.
  *
  * The bulk write itself is `df.write.jdbc` in append mode — Spark's JDBC
  * writer batches inserts per partition (`numPartitions` controls sink
  * parallelism, the analog of the reference's 4 consumer threads,
  * `import_fantoir.py:42-62`, except it scales with the cluster). DDL and
  * index statements run on a single driver-side connection, exactly like
  * the reference's cursor calls.
  */
final class JdbcSink(url: String, props: java.util.Properties,
                     dialect: SinkDialect) {

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def runAll(conn: Connection, statements: Seq[String]): Unit = {
    val st = conn.createStatement()
    try statements.foreach(st.execute) finally st.close()
  }

  /** Full lifecycle for one table. `numPartitions` bounds concurrent sink
    * connections; size it to what the DBMS tolerates, not the cluster.
    */
  def writeTable(df: DataFrame, table: SqlTableDef,
                 numPartitions: Int = 4): Unit = {
    withConnection { conn =>
      runAll(conn, dialect.dropTable(table))
      runAll(conn, dialect.createTable(table))
      runAll(conn, dialect.prepareCopy(table))
    }
    df.coalesce(numPartitions)
      .write.mode("append")
      .option("truncate", "false")
      .jdbc(url, table.name, props)
    withConnection { conn =>
      runAll(conn, dialect.finalizeCopy(table))
      table.indices.foreach(ix => runAll(conn, dialect.createIndex(table, ix)))
    }
  }

  /** Dry-run variant: render the full statement transcript without a
    * database (reference X1, `generic.py:286-324`).
    */
  def dryRunTranscript(table: SqlTableDef): Seq[String] = {
    val exec = new DryRunExecutor
    exec.execute(dialect.dropTable(table))
    exec.execute(dialect.createTable(table))
    exec.execute(dialect.prepareCopy(table))
    exec.execute(Seq(dialect.insertAll(table)))
    exec.execute(dialect.finalizeCopy(table))
    table.indices.foreach(ix => exec.execute(dialect.createIndex(table, ix)))
    exec.statements
  }
}
