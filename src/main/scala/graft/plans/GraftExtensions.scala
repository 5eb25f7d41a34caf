package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Catalyst extension point (SURVEY §4.2c): an opt-in optimizer rule that
  * rewrites exact `COUNT(DISTINCT x)` to HyperLogLog++ when
  * `spark.graft.approxDistinct.enabled=true` — the sketch-rewrite a
  * dashboard tier wants at 100 TB, where an exact distinct forces a
  * per-key shuffle but a sketch is one pass + constant state.
  *
  * Default off: the DuckDB-oracle queries and any user needing exact
  * semantics are untouched unless the session opts in.
  */
object ApproxDistinctRule extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.approxDistinct.enabled", "false")
      .toBoolean

  private val Rsd = 0.02

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
              Count(children), _, true, _, _) if children.size == 1 =>
            AggregateExpression(
              HyperLogLogPlusPlus(children.head, Rsd),
              Complete, isDistinct = false, filter = ae.filter)
        }
    }
}

/** Register with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` — GraftSession does this by default.
  *
  * Besides the optimizer rule and planner strategy, the native
  * expressions are registered as SQL functions (`graft_dot`,
  * `graft_charsum`) so `spark.sql(...)` users get the same codegen'd
  * hot loops as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  // ExpressionInfo wants the class name FIRST; misordering leaks the
  // usage text into the name shown by DESCRIBE FUNCTION. The full
  // constructor (the 5-arg one is deprecated) also takes arguments/
  // examples/note/group/since/deprecated/source — "misc_funcs" and
  // "built-in" are from its validated vocabularies.
  private def fn(name: String, className: String, usage: String,
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(className, null, name, usage,
        "", "", "", "misc_funcs", "", "", "built-in"),
      (args: Seq[Expression]) => build(args))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxDistinctRule)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectFunction(fn("graft_dot",
      classOf[graft.functions.expressions.DotProduct].getName,
      "graft_dot(a, b) - fused dot product of two array<double>",
      args => graft.functions.expressions.DotProduct(args(0), args(1))))
    e.injectFunction(fn("graft_charsum",
      classOf[graft.functions.expressions.CharSum].getName,
      "graft_charsum(s) - sum of Unicode code points of s",
      args => graft.functions.expressions.CharSum(args(0))))
    e.injectFunction(fn("graft_fingerprint",
      classOf[graft.functions.expressions.WordFingerprint].getName,
      "graft_fingerprint(words) - rolling-hash fingerprint of array<string>",
      args => graft.functions.expressions.WordFingerprint(args(0))))
  }
}
