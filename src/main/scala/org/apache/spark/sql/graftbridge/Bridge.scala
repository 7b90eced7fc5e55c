package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the classic `Column(expr)` / `col.expr` accessors
  * `private[sql]` (Connect split); an extension library reaches them
  * from inside the `org.apache.spark.sql` namespace — the same door
  * third-party Spark extensions use. Keep this the ONLY file in the
  * Spark namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
