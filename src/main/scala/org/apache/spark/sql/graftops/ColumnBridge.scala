package org.apache.spark.sql.graftops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor (Column now
  * wraps a ColumnNode); the converter lives in the sql-private
  * ExpressionUtils. This bridge re-exports just the two conversions the
  * graft custom expressions need, from inside the sql package namespace —
  * the same approach used by open-source Spark extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
