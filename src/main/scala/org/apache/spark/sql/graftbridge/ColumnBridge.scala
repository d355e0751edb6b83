package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression conversions.
  *
  * Spark 4 moved `Column` to a backend-agnostic ColumnNode model; turning
  * a custom Catalyst [[Expression]] into a user-facing [[Column]] (the
  * classic pre-4.x `new Column(expr)`) now goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is package
  * private. This object lives under `org.apache.spark.sql` to re-export
  * just those two conversions for graft's native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
