package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X176 — RFM segmentation (Hughes, "Strategic Database Marketing"
  * 1994; the workhorse customer-value census): every customer scored
  * 1–5 on Recency (latest order), Frequency (order count), Monetary
  * (lifetime decimal spend), each score an NTILE(5) quintile over a
  * TOTAL order, then the 125-cell segment census with its exact
  * headcount and spend — the frame a CRM/campaign system keys on,
  * and the categorical companion to X37's continuous CLV-ish
  * aggregates.
  *
  * Determinism: quintile boundaries are data-dependent in general —
  * here every NTILE runs over a total order ((metric, custkey)), and
  * NTILE's bucket arithmetic is integer (⌈n/k⌉-sized buckets first,
  * the SQL-standard rule Spark and DuckDB share), so scores are
  * bit-reproducible; monetary is an exact DECIMAL sum (order-free),
  * recency compares raw timestamps, and the census sums decimals
  * before the one final double cast.
  *
  * Scale shape: one map-side groupBy orders → |customers| frame; the
  * three NTILEs are global-order windows on that DIMENSION frame
  * (the q187/q207 discipline — never on facts; at 100 TB the
  * customer frame is the 1e9-row sort the warehouse already pays for
  * any ranking, and NTILE needs only a two-level count-prefix swap
  * like q149); final census is one map-side groupBy to ≤125 rows.
  */
object RfmSegmentation {

  val Quantiles = 5

  /** Per-customer RFM scores over an (o_custkey, o_orderdate,
    * o_totalprice) frame: custkey, last_order, n_orders, monetary,
    * r_q, f_q, m_q.
    */
  def scores(orders: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("monetary"))
    perCust
      .withColumn("r_q", ntile(Quantiles).over(
        Window.orderBy(col("last_order").desc, col("custkey"))))
      .withColumn("f_q", ntile(Quantiles).over(
        Window.orderBy(col("n_orders").desc, col("custkey"))))
      .withColumn("m_q", ntile(Quantiles).over(
        Window.orderBy(col("monetary").desc, col("custkey"))))
  }

  /** q214 — the RFM segment census (quintile 1 = best). */
  val q214 = GraftQuery(
    "q214_rfm_segmentation", {
      (s, d) => {
        scores(t(s, d, "orders"))
          .groupBy(col("r_q"), col("f_q"), col("m_q"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("n_orders")).as("n_orders"),
            sum(col("monetary")).cast("double").as("monetary"))
          .orderBy(col("r_q"), col("f_q"), col("m_q"))
      }
    },
    Some(s"""
      WITH per_cust AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY o_custkey),
      scored AS (
        SELECT custkey, n_orders, monetary,
               NTILE($Quantiles) OVER (ORDER BY last_order DESC, custkey)
                 AS r_q,
               NTILE($Quantiles) OVER (ORDER BY n_orders DESC, custkey)
                 AS f_q,
               NTILE($Quantiles) OVER (ORDER BY monetary DESC, custkey)
                 AS m_q
        FROM per_cust)
      SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
             CAST(m_q AS INTEGER) AS m_q,
             COUNT(*) AS n_customers,
             CAST(SUM(n_orders) AS BIGINT) AS n_orders,
             CAST(SUM(monetary) AS DOUBLE) AS monetary
      FROM scored
      GROUP BY r_q, f_q, m_q
      ORDER BY r_q, f_q, m_q
    """))

  val all: Seq[GraftQuery] = Seq(q214)
}
