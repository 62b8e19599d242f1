package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `Column.expr` bridge (Column
  * is ColumnNode-backed for Connect parity); classic-mode conversions are
  * `private[sql]`. This is the one sanctioned-shape shim — placed inside
  * `org.apache.spark.sql` so `graft.*` can build `Column`s around custom
  * Catalyst expressions. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
