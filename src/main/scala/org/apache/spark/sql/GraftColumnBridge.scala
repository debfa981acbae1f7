package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * standard seam used by Spark extension libraries to expose custom
  * Catalyst expressions as user-facing Columns (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of ColumnNode). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager ColumnNode→Expression conversion. `ExpressionUtils.expression`
    * defers unconverted nodes behind a `ColumnNodeExpression` wrapper,
    * which the Dataset API unwraps during its own analysis — but an
    * expression returned from a FunctionRegistry builder is already "past"
    * that point, so the wrapper survives to codegen and dies there. The
    * converter object resolves the whole node tree up front (function
    * column nodes become proper `UnresolvedFunction` expressions the
    * analyzer then binds). */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
