package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 moved the `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils` (package-private to
  * `org.apache.spark.sql`), so custom Catalyst expressions need this small
  * shim living inside that package to surface as user-facing `Column`s.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
