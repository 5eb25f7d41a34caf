package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** "Might be heavy" gate: true iff the count-min estimate of `child`
  * reaches `threshold`. CMS never underestimates, so the gate has NO
  * false negatives — filtering a token stream with it before an exact
  * group-by yields the exact heavy-hitter answer while the shuffle
  * carries only candidate rows (the q85 bloom-gate argument applied to
  * frequency instead of membership).
  *
  * The sketch rides as serialized bytes (content-equal Seq so two
  * gates over the same sketch canonicalize together) and deserializes
  * once per executor via the transient lazy; codegen calls back into
  * this instance, keeping the filter inside whole-stage codegen.
  * Probes use the UTF8String's bytes — the same representation
  * Spark's `count_min_sketch` aggregate inserted, so estimates line
  * up bit-for-bit with the build side.
  */
case class CmsHeavyGate(child: Expression, sketchBytes: Seq[Byte],
    threshold: Long)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cms_heavy expects string, got ${child.dataType.simpleString}")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(sketchBytes.toArray)

  def gate(s: UTF8String): Boolean =
    sketch.estimateCount(s.getBytes) >= threshold

  override def nullSafeEval(input: Any): Any =
    gate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsGate", this,
      classOf[CmsHeavyGate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.gate($c)")
  }

  override def prettyName: String = "graft_cms_heavy"

  override protected def withNewChildInternal(c: Expression): CmsHeavyGate =
    copy(child = c)
}

object CmsHeavyGate {
  def apply(c: Column, sketchBytes: Array[Byte], threshold: Long): Column =
    Bridge.column(CmsHeavyGate(Bridge.expression(c),
      sketchBytes.toIndexedSeq, threshold))
}
