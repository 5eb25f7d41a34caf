package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Alias
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
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => ApproxDistinctRule)
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
