package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Polynomial rolling-hash document fingerprint over a word array — the
  * q50 kernel as ONE native loop.
  *
  * Semantics are exactly the composable form it replaces (bit-for-bit,
  * so the DuckDB `list_reduce` oracle still hash-matches):
  *
  *   fold over words, acc0 = 0:
  *     v(w)  = numChars(w)·17 + ascii(w)·31 + ascii(reverse(w))
  *     acc'  = (acc·31 + v) mod 1e9+7
  *
  * where ascii(s) is the first code point (0 for empty) and
  * ascii(reverse(s)) the last. The composable
  * `aggregate(transform(...))` chain is a HigherOrderFunction —
  * CodegenFallback, which disqualifies the whole projection from
  * whole-stage codegen and allocates an intermediate value array per
  * row; this expression is a single fused loop. A null element nulls
  * the result (matching the fold's null propagation).
  */
case class WordFingerprint(child: Expression) extends UnaryExpression {

  private val P = 1000000007L

  override def dataType: DataType = LongType

  // the result can be null when an ELEMENT is null, not only when the
  // array itself is — without this, codegen's non-nullable branch never
  // declares ev.isNull and the generated code fails to compile (and the
  // interpreted path would return null for a declared-non-null long)
  override def nullable: Boolean = child.nullable || (child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val u = arr.getUTF8String(i)
      val s = u.toString
      val first = if (s.isEmpty) 0 else s.codePointAt(0)
      val last = if (s.isEmpty) 0 else s.codePointBefore(s.length)
      val v = u.numChars().toLong * 17L + first.toLong * 31L + last.toLong
      acc = (acc * 31L + v) % P
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val u = ctx.freshName("u")
      val s = ctx.freshName("s")
      val first = ctx.freshName("first")
      val last = ctx.freshName("last")
      val v = ctx.freshName("v")
      // ev.isNull is the literal `false` when nullable=false — only emit
      // the null-element branch when elements can actually be null
      val nullElementCheck =
        if (nullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullElementCheck
         |  org.apache.spark.unsafe.types.UTF8String $u = $a.getUTF8String($i);
         |  String $s = $u.toString();
         |  int $first = $s.isEmpty() ? 0 : $s.codePointAt(0);
         |  int $last = $s.isEmpty() ? 0 : $s.codePointBefore($s.length());
         |  long $v = (long) $u.numChars() * 17L + (long) $first * 31L + (long) $last;
         |  $acc = ($acc * 31L + $v) % ${P}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WordFingerprint =
    copy(child = c)
}

object WordFingerprint {
  def apply(c: Column): Column =
    Bridge.column(WordFingerprint(Bridge.expression(c)))
}
