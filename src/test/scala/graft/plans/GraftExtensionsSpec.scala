package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  private def distinctCount(): Long =
    spark.read.parquet(s"$sf0001/lineitem.parquet")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .first().getLong(0)

  test("approx-distinct rewrite: off by default, exact result") {
    val exact = distinctCount()
    assert(exact === spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey").distinct().count())
  }

  test("approx-distinct rewrite: opt-in flips COUNT DISTINCT to HLL") {
    val exact = distinctCount()
    spark.conf.set("spark.graft.approxDistinct.enabled", "true")
    try {
      val approx = distinctCount()
      // sketch result: close to exact, but produced by the HLL rewrite —
      // with rsd 0.02 on this cardinality, a hash-identical exact result
      // is possible, so assert the PLAN changed too
      assert(math.abs(approx - exact).toDouble / exact < 0.05)
      val plan = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .agg(countDistinct(col("l_orderkey")))
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct") ||
        plan.toLowerCase.contains("hyperloglog"),
        s"rewrite missing from plan:\n$plan")
    } finally spark.conf.set("spark.graft.approxDistinct.enabled", "false")
  }

  test("native expressions are SQL-callable via injected functions") {
    val row = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d, " +
        "graft_charsum('abc') AS c").first()
    assert(row.getDouble(0) === 32.0)
    assert(row.getInt(1) === 97 + 98 + 99)
    // same codegen'd expression as the Column API, not a UDF wrapper
    val plan = spark.sql("SELECT graft_dot(array(1.0d), array(2.0d))")
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
