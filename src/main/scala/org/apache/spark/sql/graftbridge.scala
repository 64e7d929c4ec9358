package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst-Expression bridge.
  *
  * Spark 4 made the `Column` API connect-agnostic: `Column` wraps a
  * `ColumnNode`, and the Expression conversions live in
  * `classic.ExpressionUtils`, which is `private[sql]`. A library
  * shipping custom Catalyst expressions (graft.functions.DotProductExpr)
  * needs exactly these two conversions, so this object re-exports them
  * from inside the `org.apache.spark.sql` package — the standard
  * extension-library technique (same access pattern Spark connectors
  * use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
