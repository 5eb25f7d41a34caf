package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X187 — fulfillment-lag ageing census (the order-cycle-time SLA
  * report; Little's law's L = λW read per priority class): per order
  * the lag from order date to its LAST line shipment, bucketed into
  * the ops ladder (≤7 d, ≤30 d, ≤90 d, over / unshipped), crossed
  * with the order's priority — "are URGENT orders actually faster?"
  * is one look at the matrix, and the unshipped column is the
  * open-backlog census. The warehouse-ops sibling of X122
  * (conversion lag on the clickstream; this is the fulfilment ledger
  * with an explicit open-order class a percentile cannot carry).
  *
  * Exactness: lag = integer day difference on raw dates; buckets are
  * integer compares; the per-class share is one double division.
  * Orders with NO lineitems at all surface in the `unshipped`
  * bucket via the left join (stated — they are the backlog, not a
  * dropped row).
  *
  * Scale shape: one map-side lineitem groupBy (max shipdate per
  * order, the FK exchange), one orderkey-co-partitioned left join to
  * orders, one map-side census to ≤ |priorities × buckets| rows.
  */
object FulfillmentLag {

  /** Bucket upper bounds in days. */
  val Buckets = Seq(7L, 30L, 90L)

  /** q224 — the priority × lag-bucket census. */
  val q224 = GraftQuery(
    "q224_fulfillment_lag", {
      (s, d) => {
        val shipped = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("okey"))
          .agg(max(col("l_shipdate")).as("last_ship"),
            count(lit(1)).as("n_lines"))
        val lagged = t(s, d, "orders")
          .join(shipped, col("o_orderkey") === col("okey"), "left")
          .withColumn("lag_days",
            datediff(col("last_ship"), col("o_orderdate")).cast("long"))
          .withColumn("bucket",
            when(col("lag_days").isNull, "z_unshipped")
              .otherwise(when(col("lag_days") <= Buckets(0), "a_week")
                .otherwise(when(col("lag_days") <= Buckets(1), "b_month")
                  .otherwise(when(col("lag_days") <= Buckets(2),
                    "c_quarter").otherwise("d_over")))))
        val census = lagged
          .groupBy(col("o_orderpriority").as("priority"), col("bucket"))
          .agg(count(lit(1)).as("n_orders"),
            sum(coalesce(col("n_lines"), lit(0L))).as("n_lines"),
            max(col("lag_days")).as("max_lag_days"))
        val totals = lagged.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("priority_orders"))
        census.join(broadcast(totals), "priority")
          .withColumn("share",
            col("n_orders").cast("double") /
              col("priority_orders").cast("double"))
          .select(col("priority"), col("bucket"), col("n_orders"),
            col("n_lines"), col("max_lag_days"), col("share"))
          .orderBy(col("priority"), col("bucket"))
      }
    },
    Some(s"""
      WITH shipped AS (
        SELECT l_orderkey AS okey, MAX(l_shipdate) AS last_ship,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY 1),
      lagged AS (
        SELECT o.o_orderpriority AS priority,
               datediff('day', o.o_orderdate, s.last_ship) AS lag_days,
               s.n_lines
        FROM orders o LEFT JOIN shipped s ON s.okey = o.o_orderkey),
      bucketed AS (
        SELECT priority, n_lines, lag_days,
               CASE WHEN lag_days IS NULL THEN 'z_unshipped'
                    WHEN lag_days <= ${Buckets(0)} THEN 'a_week'
                    WHEN lag_days <= ${Buckets(1)} THEN 'b_month'
                    WHEN lag_days <= ${Buckets(2)} THEN 'c_quarter'
                    ELSE 'd_over' END AS bucket
        FROM lagged),
      census AS (
        SELECT priority, bucket, COUNT(*) AS n_orders,
               CAST(SUM(COALESCE(n_lines, 0)) AS BIGINT) AS n_lines,
               CAST(MAX(lag_days) AS BIGINT) AS max_lag_days
        FROM bucketed GROUP BY 1, 2),
      totals AS (
        SELECT priority, COUNT(*) AS priority_orders
        FROM bucketed GROUP BY 1)
      SELECT c.priority, c.bucket, c.n_orders, c.n_lines,
             c.max_lag_days,
             CAST(c.n_orders AS DOUBLE) /
               CAST(t.priority_orders AS DOUBLE) AS share
      FROM census c JOIN totals t ON t.priority = c.priority
      ORDER BY c.priority, c.bucket
    """))

  val all: Seq[GraftQuery] = Seq(q224)
}
