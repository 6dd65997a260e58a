package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private-access shim: Spark 4 moved the classic
  * Column ↔ Expression bridge behind `private[sql]`
  * (`classic.ExpressionUtils`, part of the Connect column-node
  * refactor), so third-party libraries exposing typed `Column` wrappers
  * over custom Catalyst expressions need one file in the
  * `org.apache.spark.sql` package — the established extension-library
  * pattern (Frameless, Sedona, Delta all ship an equivalent shim).
  * Everything else in this repo stays in the `graft` namespace.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
