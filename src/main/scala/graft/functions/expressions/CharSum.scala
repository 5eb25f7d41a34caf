package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of Unicode code points of a string — the scorer's text-hash term.
  *
  * The composable form `aggregate(transform(split(s, ''), ascii), 0, +)`
  * is a HigherOrderFunction chain: CodegenFallback, which disqualifies the
  * entire projection from whole-stage codegen (observed in q21's plan) and
  * allocates a per-character array per row. This expression generates one
  * code-point loop. Semantics match the fold on any input (sum of code
  * points; empty string → 0), and match DuckDB's
  * `list_sum(list_transform(string_split(s,''), ascii))` on the ASCII-only
  * normalized text the scorer feeds it.
  */
case class CharSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_charsum expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc += cp
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $c.toString();
         |int $acc = 0;
         |for (int $i = 0; $i < $s.length(); ) {
         |  int $cp = $s.codePointAt($i);
         |  $acc += $cp;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharSum =
    copy(child = newChild)
}

object CharSum {
  def apply(c: Column): Column = Bridge.column(CharSum(Bridge.expression(c)))
}
