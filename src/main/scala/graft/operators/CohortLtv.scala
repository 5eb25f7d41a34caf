package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X186 — cohort LTV / revenue-retention matrix (the subscription-
  * economics standard; see Fader & Hardie's cohort decompositions):
  * customers grouped by FIRST-ORDER month, revenue rolled up by
  * cohort × months-since-first — the (cohort, age) triangle whose
  * rows answer "do newer cohorts monetize faster?" and whose
  * diagonal sums reconcile to the revenue ledger. X94's retention
  * cohorts count RETURNING USERS; this carries exact DECIMAL revenue
  * and the cumulative LTV path, the number a payback model consumes.
  *
  * Exactness: cohort month and age are integer month arithmetic
  * (months_between on truncated months is exact); revenue is the
  * exact DECIMAL sum; cumulative LTV per cohort is a prefix sum over
  * the age order, divided once by cohort size for the per-customer
  * path (one double division per cell).
  *
  * Scale shape: one map-side groupBy for first-order months
  * (|customers| frame), a broadcast-shaped join back to orders (at
  * 100 TB: the user-keyed shuffle every cohort query pays once),
  * one map-side census to |cohorts × ages| cells, prefix windows on
  * that dimension frame.
  */
object CohortLtv {

  /** q223 — the cohort × age revenue matrix with cumulative LTV. */
  val q223 = GraftQuery(
    "q223_cohort_ltv", {
      (s, d) => {
        val orders = t(s, d, "orders").select(col("o_custkey"),
          date_trunc("month", col("o_orderdate")).as("m"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("rev"))
        val firsts = orders.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("cohort"))
        val sizes = firsts.groupBy(col("cohort"))
          .agg(count(lit(1)).as("cohort_customers"))
        val cells = orders.join(firsts, "o_custkey")
          .withColumn("age",
            months_between(col("m"), col("cohort")).cast("int"))
          .groupBy(col("cohort"), col("age"))
          .agg(count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("active_customers"),
            sum(col("rev")).as("revenue"))
        val wPre = Window.partitionBy(col("cohort")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.join(sizes, "cohort")
          .withColumn("cum_revenue", sum(col("revenue")).over(wPre))
          .select(col("cohort"), col("age"), col("cohort_customers"),
            col("active_customers"), col("n_orders"),
            col("revenue").cast("double").as("revenue"),
            (col("cum_revenue").cast("double") /
              col("cohort_customers").cast("double"))
              .as("cum_ltv_per_customer"))
          .orderBy(col("cohort"), col("age"))
      }
    },
    Some("""
      WITH orders_m AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
               CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        FROM orders),
      firsts AS (
        SELECT o_custkey, MIN(m) AS cohort FROM orders_m GROUP BY 1),
      sizes AS (
        SELECT cohort, COUNT(*) AS cohort_customers
        FROM firsts GROUP BY 1),
      cells AS (
        SELECT f.cohort,
               CAST(datediff('month', f.cohort, o.m) AS INTEGER) AS age,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o.o_custkey) AS active_customers,
               SUM(o.rev) AS revenue
        FROM orders_m o JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2)
      SELECT c.cohort, c.age, s.cohort_customers, c.active_customers,
             c.n_orders,
             CAST(c.revenue AS DOUBLE) AS revenue,
             CAST(SUM(c.revenue) OVER (PARTITION BY c.cohort
               ORDER BY c.age
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / CAST(s.cohort_customers AS DOUBLE)
               AS cum_ltv_per_customer
      FROM cells c JOIN sizes s ON s.cohort = c.cohort
      ORDER BY c.cohort, c.age
    """))

  val all: Seq[GraftQuery] = Seq(q223)
}
