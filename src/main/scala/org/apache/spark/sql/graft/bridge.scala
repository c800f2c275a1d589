package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 hides Expression<->Column conversion behind private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This bridge lives
  * in the org.apache.spark.sql namespace purely to re-export the two
  * conversions graft's native expressions need — the standard pattern
  * for Catalyst extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
