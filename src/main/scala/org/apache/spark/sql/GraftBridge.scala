/*
 * Lives in org.apache.spark.sql ONLY to reach the classic Column <->
 * Expression converters, which are `private[sql]`. This is the standard
 * packaging for Spark extension libraries that ship custom Catalyst
 * expressions behind a Column DSL (the public API offers no conversion).
 * Nothing else may go in this package.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object GraftBridge {
  /** Eagerly convert the Column's node tree into catalyst expressions
    * (UnresolvedFunction etc.) that the analyzer can resolve — the lazy
    * `ExpressionUtils.expression` wrapper stays a ColumnNodeExpression,
    * which is Unevaluable when returned from an injected FunctionBuilder.
    */
  def toExpr(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
