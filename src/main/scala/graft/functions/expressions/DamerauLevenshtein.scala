package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unrestricted Damerau-Levenshtein distance (X155). Spark ships
  * `levenshtein` but no transposition-aware distance, and "transposed
  * two letters" is THE dominant human typo class (Damerau 1964 measured
  * >80 % of spelling errors as one of these four edits) — a fuzzy
  * match tier built on plain Levenshtein mis-prices exactly the most
  * common error. The kernel lives in
  * [[graft.functions.StringAlgos.damerauLevenshtein]]; codegen emits a
  * static call (the Spark-core `Levenshtein`/`UTF8String` pattern), so
  * the projection stays inside whole-stage codegen — no UDF plumbing,
  * no serialization, no CodegenFallback.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_damerau expects string inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringAlgos.damerauLevenshtein(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = graft.functions.StringAlgos.damerauLevenshtein(
         |  $a.toString(), $b.toString());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))
}
