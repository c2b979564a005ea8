package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column⇄Expression converters — the
  * supported way for a library to expose custom Catalyst expressions as
  * user-facing Columns in Spark 4 (the pre-4.0 `new Column(expr)`
  * constructor is gone with the Connect refactor). Lives under the
  * `org.apache.spark.sql` package namespace solely for access. */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
