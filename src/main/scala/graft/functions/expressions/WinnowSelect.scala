package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Winnowing fingerprint selection over a word array — the
  * [[graft.operators.Winnowing]] kernel as one native expression:
  * array<string> words in, the ascending distinct array of selected
  * skeys (hash·2^21 + (2^21−1−pos)) out.
  *
  * Why an expression and not explode-then-window: the oracle's
  * formulation materializes EVERY k-gram as a row and runs a window
  * min — n rows shuffled per doc where the selection keeps only
  * ~2/(w+1) of them. Doing the O(n) deque selection inside the scan
  * projection means the exploded, shuffled row count is the SELECTED
  * density, and `doGenCode` emits a single static call to the shared
  * kernel so the projection stays inside whole-stage codegen (the
  * BpeTokenCount pattern — a Scala UDF would fence it, a higher-order
  * aggregate/transform chain would be CodegenFallback).
  *
  * A null ELEMENT nulls the result (the WordFingerprint fold
  * discipline); a doc shorter than k words yields an empty array.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null when the array itself is null OR an element is (kernel returns
  // null on a null element) — without declaring it, codegen never emits
  // ev.isNull and the null-element branch cannot compile
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    graft.operators.Winnowing.selectSkeys(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val res = ctx.freshName("winnowRes")
      val nullBranch =
        if (nullable) s"if ($res == null) { ${ev.isNull} = true; } else"
        else ""
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.operators.Winnowing.selectSkeys($a, $k, $w);
         |$nullBranch { ${ev.value} = $res; }
       """.stripMargin
    })

  override def prettyName: String = "graft_winnow"

  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
}

object WinnowSelect {
  def apply(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowSelect(Bridge.expression(c), k, w))
}
