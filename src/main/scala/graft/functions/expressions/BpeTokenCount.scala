package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE token count of a whitespace-separated text under a learned merge
  * table ([[graft.operators.Bpe]]).
  *
  * Why an expression and not a UDF: the merge-rank dictionary rides the
  * expression as a reference object (serialized once per task, not per
  * row), and `doGenCode` emits a single static call — the projection
  * stays inside whole-stage codegen (a Scala UDF would fence it). The
  * dictionary-driven merge loop itself lives in
  * [[graft.operators.Bpe.countTokens]], shared verbatim with the
  * interpreted path so eval and codegen cannot diverge.
  *
  * `merges` is a Seq (not Array) on purpose: case-class equality is by
  * content, so two instances with equal tables canonicalize together
  * and subexpression elimination works (the VectorExpressions lesson).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_tokens expects string, got ${child.dataType.simpleString}")

  @transient private lazy val ranks = graft.operators.Bpe.ranks(merges)

  override def nullSafeEval(input: Any): Any =
    graft.operators.Bpe.countTokens(input.asInstanceOf[UTF8String].toString,
      ranks)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Bpe.countTokens($c.toString(), $ranksRef)")
  }

  override def prettyName: String = "graft_bpe_tokens"

  override protected def withNewChildInternal(c: Expression): BpeTokenCount =
    copy(child = c)
}

object BpeTokenCount {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c), merges))
}
