package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ↔ Expression bridge. Spark 4 removed the public `Column(expr)` /
  * `col.expr` surface (Connect-compatible API); the conversion lives in
  * `private[sql]` ExpressionUtils, so this one-file shim sits inside the
  * org.apache.spark.sql namespace — the standard pattern for libraries
  * that add native Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Convert eagerly via the column-node converter: ExpressionUtils'
    * lazy ColumnNodeExpression wrapper is Unevaluable and only unwraps on
    * the Dataset API path, not inside custom logical plans.
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed

  /** Build a DataFrame over a (possibly custom) logical plan; the
    * analyzer resolves any remaining unresolved expressions in it.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
