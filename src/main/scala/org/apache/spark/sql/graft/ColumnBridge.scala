package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column↔Expression constructors behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`).
  * Libraries that ship custom Catalyst expressions bridge them from a
  * sub-package of `org.apache.spark.sql` — the same pattern used by
  * Delta/Sedona-style extension projects. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
