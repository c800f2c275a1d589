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

  /** True iff the Column is a bare column reference (plain `col("x")`,
    * a frame-bound `df("x")`, or a raw attribute) — NOT a derived
    * expression, even one aliased back to its source name.
    *
    * Must inspect the Column's NODE, not `expression(c)`: on Spark 4
    * `ExpressionUtils.expression` only unwraps `ExpressionColumnNode`
    * (frame-bound columns); every API-built Column — including plain
    * `col("x")` — comes back as a lazy `ColumnNodeExpression` wrapper,
    * so a catalyst-layer `AttributeReference`/`UnresolvedAttribute`
    * match is false for exactly the most common plain input.
    */
  def isPlainAttribute(c: Column): Boolean = c.node match {
    case _: org.apache.spark.sql.internal.UnresolvedAttribute => true
    case n: org.apache.spark.sql.classic.ExpressionColumnNode =>
      n.expression match {
        case _: org.apache.spark.sql.catalyst.expressions.AttributeReference => true
        case _: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => true
        case _ => false
      }
    case _ => false // incl. internal.Alias: lower(col("x")).as("x")
  }
}
