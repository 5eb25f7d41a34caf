package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X191 — growth-accounting revenue bridge (the new/resurrected/
  * expansion/contraction/churn waterfall; the SaaS-metrics standard
  * popularized by the Social Capital growth-accounting notes): for
  * every month, month-over-month revenue change decomposed into the
  * five customer movements — the report that turns "revenue grew 4 %"
  * into WHY. X186 slices revenue by acquisition cohort; this slices
  * the month-over-month DELTA by customer state transition.
  *
  * The discipline that makes it an OPERATOR rather than a dashboard
  * query: the bridge identity
  *   total_m − total_{m−1} = new + resurrected + expansion
  *                           − contraction − churned
  * is carried as an exact-DECIMAL `bridge_ok` column computed from
  * independently-aggregated sides — the operator PROVES its own
  * decomposition on every row (spec also plants each movement).
  * New vs resurrected is decided against the customer's true first
  * month, not mere m−1 absence.
  *
  * Scale shape: one map-side groupBy to the |customer-months| frame;
  * ONE customer-keyed self-join of that contracted frame on adjacent
  * months (full outer, so churn rows survive); first-months from one
  * more map-side agg broadcast back; month census = map-side groupBy
  * to |months| rows. Facts are scanned once.
  */
object GrowthAccounting {

  /** q228 — the monthly revenue bridge. */
  val q228 = GraftQuery(
    "q228_growth_accounting", {
      (s, d) => {
        val cm = t(s, d, "orders")
          .groupBy(col("o_custkey").as("cust"),
            ((year(col("o_orderdate")) * 12) +
              month(col("o_orderdate")) - 1).cast("long").as("mi"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .as("rev"))
        val firsts = cm.groupBy(col("cust"))
          .agg(min(col("mi")).as("first_mi"))
        val cur = cm.select(col("cust"), col("mi"), col("rev"))
        val prev = cm.select(col("cust").as("cust_p"),
          (col("mi") + 1).as("mi_p"), col("rev").as("rev_p"))
        val moves = cur.join(prev,
            cur("cust") === col("cust_p") && cur("mi") === col("mi_p"),
            "full_outer")
          .select(coalesce(col("cust"), col("cust_p")).as("cust"),
            coalesce(col("mi"), col("mi_p")).as("mi"),
            col("rev"), col("rev_p"))
          .join(firsts, Seq("cust"))
        val zero = lit(0).cast(DecimalType(18, 2))
        val classed = moves.select(col("mi"),
          when(col("rev_p").isNull && col("mi") === col("first_mi"),
            col("rev")).otherwise(zero).as("new_rev"),
          when(col("rev_p").isNull && col("mi") > col("first_mi"),
            col("rev")).otherwise(zero).as("resurrected_rev"),
          when(col("rev").isNotNull && col("rev_p").isNotNull &&
            col("rev") > col("rev_p"), col("rev") - col("rev_p"))
            .otherwise(zero).as("expansion_rev"),
          when(col("rev").isNotNull && col("rev_p").isNotNull &&
            col("rev") < col("rev_p"), col("rev_p") - col("rev"))
            .otherwise(zero).as("contraction_rev"),
          when(col("rev").isNull, col("rev_p")).otherwise(zero)
            .as("churned_rev"))
          .groupBy(col("mi"))
          .agg(sum(col("new_rev")).as("new_rev"),
            sum(col("resurrected_rev")).as("resurrected_rev"),
            sum(col("expansion_rev")).as("expansion_rev"),
            sum(col("contraction_rev")).as("contraction_rev"),
            sum(col("churned_rev")).as("churned_rev"))
        val totals = cm.groupBy(col("mi"))
          .agg(sum(col("rev")).as("total"))
        val withTot = classed
          .join(totals, Seq("mi"), "left")
          .join(totals.select((col("mi") + 1).as("mi"),
            col("total").as("total_prev")), Seq("mi"), "left")
          .withColumn("total", coalesce(col("total"), zero))
          .withColumn("total_prev", coalesce(col("total_prev"), zero))
        withTot.select(col("mi"),
            col("total").cast("double").as("total"),
            col("new_rev").cast("double").as("new_rev"),
            col("resurrected_rev").cast("double").as("resurrected_rev"),
            col("expansion_rev").cast("double").as("expansion_rev"),
            col("contraction_rev").cast("double").as("contraction_rev"),
            col("churned_rev").cast("double").as("churned_rev"),
            (col("total") - col("total_prev") ===
              col("new_rev") + col("resurrected_rev") +
                col("expansion_rev") - col("contraction_rev") -
                col("churned_rev")).as("bridge_ok"))
          .orderBy(col("mi"))
      }
    },
    Some("""
      WITH cm AS (
        SELECT o_custkey AS cust,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                 AS BIGINT) AS mi,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      firsts AS (SELECT cust, MIN(mi) AS first_mi FROM cm GROUP BY 1),
      moves AS (
        SELECT COALESCE(c.cust, p.cust) AS cust,
               COALESCE(c.mi, p.mi + 1) AS mi,
               c.rev AS rev, p.rev AS rev_p
        FROM cm c FULL OUTER JOIN cm p
          ON p.cust = c.cust AND c.mi = p.mi + 1),
      classed AS (
        SELECT m.mi,
               SUM(CASE WHEN m.rev_p IS NULL AND m.mi = f.first_mi
                 THEN m.rev ELSE 0 END) AS new_rev,
               SUM(CASE WHEN m.rev_p IS NULL AND m.mi > f.first_mi
                 THEN m.rev ELSE 0 END) AS resurrected_rev,
               SUM(CASE WHEN m.rev IS NOT NULL AND m.rev_p IS NOT NULL
                 AND m.rev > m.rev_p THEN m.rev - m.rev_p ELSE 0 END)
                 AS expansion_rev,
               SUM(CASE WHEN m.rev IS NOT NULL AND m.rev_p IS NOT NULL
                 AND m.rev < m.rev_p THEN m.rev_p - m.rev ELSE 0 END)
                 AS contraction_rev,
               SUM(CASE WHEN m.rev IS NULL THEN m.rev_p ELSE 0 END)
                 AS churned_rev
        FROM moves m JOIN firsts f ON f.cust = m.cust
        GROUP BY m.mi),
      totals AS (SELECT mi, SUM(rev) AS total FROM cm GROUP BY 1)
      SELECT c.mi,
             CAST(COALESCE(t.total, 0) AS DOUBLE) AS total,
             CAST(c.new_rev AS DOUBLE) AS new_rev,
             CAST(c.resurrected_rev AS DOUBLE) AS resurrected_rev,
             CAST(c.expansion_rev AS DOUBLE) AS expansion_rev,
             CAST(c.contraction_rev AS DOUBLE) AS contraction_rev,
             CAST(c.churned_rev AS DOUBLE) AS churned_rev,
             COALESCE(t.total, 0) - COALESCE(tp.total, 0) =
               c.new_rev + c.resurrected_rev + c.expansion_rev
               - c.contraction_rev - c.churned_rev AS bridge_ok
      FROM classed c
      LEFT JOIN totals t ON t.mi = c.mi
      LEFT JOIN totals tp ON tp.mi + 1 = c.mi
      ORDER BY c.mi
    """))

  val all: Seq[GraftQuery] = Seq(q228)
}
