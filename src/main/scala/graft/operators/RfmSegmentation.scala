package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale shape (r19 — VERDICT r18 item 1): one map-side groupBy
  * orders → |customers| frame; each NTILE is the q149 two-level
  * count-prefix swap ([[RankSum.bucketedRowNumber]] +
  * [[RankSum.ntileOf]]) — per-bucket counts, a ≤1025-row offsets
  * frame broadcast back, a bucket-PARTITIONED row_number, then
  * integer tile arithmetic. NO single-partition window anywhere: at
  * 100 TB the 1e9-row customer frame never funnels through one
  * executor (PlanSpec-gated). Final census is one map-side groupBy
  * to ≤125 rows.
  */
object RfmSegmentation {

  val Quantiles = 5

  /** Per-customer RFM scores over an (o_custkey, o_orderdate,
    * o_totalprice) frame: custkey, last_order, n_orders, monetary,
    * r_q, f_q, m_q.
    */
  def scores(orders: DataFrame): DataFrame = {
    // eager-checkpointed: the per-customer rollup feeds five branches
    // (one shared span, three offsets, the main chain) — materialize
    // once instead of re-aggregating per branch (r19)
    val perCust = graft.Checkpoints.eager(orders
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("monetary")))
    // three quintiles in one flat two-level swap — v is the NEGATED
    // metric (the bucket key must ascend along the DESC order); the
    // exact sort re-happens inside the bucket partitions only
    val ranked = RankSum.bucketedRowNumbers(perCust, Seq(
      RankSum.RankSpec(-col("last_order").cast("double"), "rn_r",
        Seq(col("last_order").desc, col("custkey"))),
      RankSum.RankSpec(-col("n_orders").cast("double"), "rn_f",
        Seq(col("n_orders").desc, col("custkey"))),
      RankSum.RankSpec(-col("monetary").cast("double"), "rn_m",
        Seq(col("monetary").desc, col("custkey")))),
      withTotal = true)
    ranked
      .withColumn("r_q",
        RankSum.ntileOf(col("rn_r"), col("n_total"), Quantiles))
      .withColumn("f_q",
        RankSum.ntileOf(col("rn_f"), col("n_total"), Quantiles))
      .withColumn("m_q",
        RankSum.ntileOf(col("rn_m"), col("n_total"), Quantiles))
      .drop("rn_r", "rn_f", "rn_m", "n_total")
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
