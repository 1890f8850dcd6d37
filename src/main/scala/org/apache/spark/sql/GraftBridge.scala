package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the Column ↔ Expression conversion `private[sql]`
  * (classic.ExpressionUtils); extension libraries provide a one-object
  * bridge inside the sql package — the established pattern for shipping
  * native expressions without forking Spark. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion: a REAL Catalyst tree (with
    * UnresolvedAttributes ready for the analyzer), not the lazy
    * ColumnNodeExpression wrapper `expression` returns — required when the
    * expression is handed to the analyzer outside a Dataset context (e.g.
    * from a SQL function builder registered via SparkSessionExtensions). */
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
