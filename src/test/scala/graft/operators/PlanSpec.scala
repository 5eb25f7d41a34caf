package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}

import graft.SparkSpec

/** Physical-plan guardrails: the properties that make these plans survive
  * a 100× scale-up must hold structurally, not accidentally — filters
  * reach the parquet scan, projections prune the read schema, small
  * dimensions broadcast, codegen covers the hot path.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q01: shipdate filter is pushed to the parquet scan") {
    val plan = planOf(RelationalQueries.q01.build(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown:\n$plan")
  }

  test("q01: scan reads only the five needed lineitem columns") {
    val plan = planOf(RelationalQueries.q01.build(spark, sf0001))
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate").foreach(c =>
      assert(readSchema.contains(c), s"$c missing from $readSchema"))
    Seq("l_orderkey", "l_partkey", "l_tax", "l_linenumber").foreach(c =>
      assert(!readSchema.contains(c), s"$c not pruned: $readSchema"))
  }

  test("q04: dimension joins are broadcast, fact join shuffles") {
    val plan = planOf(RelationalQueries.q04.build(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q02: all predicates reach the part scan") {
    // toString truncates the PushedFilters list; assert its prefix and the
    // full predicate set in the Filter node above the scan
    val plan = planOf(RelationalQueries.q02.build(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(p_size)"), plan)
    assert(plan.contains("p_size#") && plan.contains("IN (Brand#1"), plan)
  }

  test("q21: whole-stage codegen covers the scorer pipeline (no UDF break)") {
    // AQE hides codegen stages until execution; inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the "*(n)" prefix marks whole-stage-codegen'd operators
      val plan = planOf(PipelineQueries.q21.build(spark, sf0001))
      assert(plan.linesIterator.exists(l =>
        l.trim.matches("""[+\-: ]*\*\(\d+\) Project.*""")),
        s"scorer projection not codegen'd:\n${plan.take(1500)}")
      assert(plan.contains("charsum("),
        "native CharSum must be in the scorer plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("SQLUDF"),
        "scorer must stay native")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q45: native graft_dot expression appears in the plan") {
    val plan = planOf(SimilarityQueries.q45.build(spark, sf0001))
    assert(plan.contains("DotProduct") || plan.toLowerCase.contains("dotproduct"),
      s"custom expression not in plan:\n${plan.take(2000)}")
  }

  test("q12: global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val plan = planOf(RelationalQueries.q12.build(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
