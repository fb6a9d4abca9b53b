package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters — the
  * standard mechanism for third-party Catalyst expressions on Spark 4.x
  * (Column no longer exposes `.expr` publicly).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. `expression` wraps the column
    * node lazily (`ColumnNodeExpression`), which the analyzer will not
    * descend into when the expression is returned from a FunctionRegistry
    * builder — eager conversion yields a plain (possibly Unresolved*)
    * Catalyst tree the analyzer resolves to fixpoint like any SQL macro.
    */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
