package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to the `private[sql]` Column <-> Expression converters.
 *
 * Spark 4 moved `Column` to the connect-agnostic sql-api, hiding the
 * Catalyst expression behind `private[sql] ExpressionUtils`
 * (sql/core `columnNodeSupport.scala`). Libraries that define custom
 * Catalyst `Expression`s (the documented extension tier below a full
 * planner strategy) need exactly these two functions, hence this shim in
 * a subpackage of `org.apache.spark.sql`.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGERLY convert a Column's node tree to a Catalyst expression tree
    * (`ColumnNodeToExpressionConverter`). [[expression]] wraps lazily as
    * a `ColumnNodeExpression`, which only the Dataset API's own
    * analysis unwraps — an expression embedded into a SQL plan by a
    * FunctionRegistry builder (GraftSqlExtensions) must be a real
    * Catalyst tree (its UnresolvedFunctions then resolve normally), or
    * codegen hits the Unevaluable wrapper. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
