package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 removed the public `Column(expr)` /
  * `col.expr` surface (Connect-compatible API); the conversion lives in
  * `private[sql]` ExpressionUtils, so this one-file shim sits inside the
  * org.apache.spark.sql namespace — the standard pattern for libraries
  * that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
