package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — Spark 4
  * removed the public `new Column(expr)` constructor, and third-party
  * Catalyst expressions need exactly this hop. Lives under
  * `org.apache.spark.sql` for access; keep it to these two calls. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
