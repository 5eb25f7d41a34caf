package graft.operators

import Q._

/** Queries driven through the `spark.sql` front-end (temp views + SQL
  * text) rather than the DataFrame API — the other half of the public
  * query surface. Catalyst compiles both to the same plans; these prove
  * the SQL entry path end-to-end: cube grouping metadata and
  * scalar/correlated subqueries (decorrelated to joins by the
  * optimizer — no per-row re-execution).
  */
object SqlSurfaceQueries {

  /** CUBE with grouping_id/grouping metadata — how a dashboard tells
    * subtotal rows from data rows (the bit vector is the standard
    * contract: first cube column = highest bit in both engines).
    */
  val q66 = GraftQuery(
    "q66_sql_grouping_id",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT)
                 AS gid,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio
        FROM orders_v
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY gid, o_orderpriority, o_orderstatus
      """)
    },
    Some("""
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
             CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
             CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
      FROM orders
      GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority, o_orderstatus
    """))

  /** Scalar + correlated scalar subqueries. Thresholds use exact
    * decimal arithmetic (price·n > Σprice instead of price > avg) so
    * the row set is deterministic across engines and partitionings —
    * a double `avg` threshold could flip boundary rows by one ulp.
    */
  val q67 = GraftQuery(
    "q67_sql_subqueries",
    (s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_custkey, c_mktsegment,
               (SELECT COUNT(*) FROM orders_v
                WHERE o_custkey = c_custkey) AS n_orders
        FROM customer_v
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
                (SELECT COUNT(*) FROM customer_v)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                 FROM customer_v)
        ORDER BY c_custkey
      """)
    },
    Some("""
      SELECT c_custkey, c_mktsegment,
             (SELECT COUNT(*) FROM orders
              WHERE o_custkey = c_custkey) AS n_orders
      FROM customer
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM customer)
            > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
      ORDER BY c_custkey
    """))

  val all: Seq[GraftQuery] = Seq(q66, q67)
}
