package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** Reconciliation-style relational completions (VERDICT r2 gaps): the
  * full-outer and right equi-join slices of X8, the rank/dense_rank
  * slice of X13, and the get_json_object / map_keys / element_at scalar
  * stragglers of X2.
  */
object ReconQueries {

  /** FULL OUTER reconciliation [X8]: daily order intake vs daily shipped
    * lines. The two date domains genuinely differ (shipments lag orders),
    * so both null sides occur. Both inputs are pre-aggregated before the
    * join — at 100 TB the full-outer joins two date-cardinality frames
    * (thousands of rows), not fact tables.
    */
  val q58 = GraftQuery(
    "q58_full_outer_recon",
    (s, d) => {
      val orderDaily = t(s, d, "orders")
        .groupBy(col("o_orderdate").as("od"))
        .agg(count(lit(1)).as("n_orders"))
      val shipDaily = t(s, d, "lineitem")
        .groupBy(col("l_shipdate").as("sd"))
        .agg(count(lit(1)).as("n_shipped"))
      orderDaily
        .join(shipDaily, col("od") === col("sd"), "full_outer")
        .select(
          coalesce(col("od"), col("sd")).as("day"),
          col("n_orders"), col("n_shipped"),
          // explicit null-side markers: the reconciliation signal
          (col("od").isNull || col("sd").isNull).as("one_sided"))
        .orderBy(col("day"))
    },
    Some("""
      SELECT COALESCE(od.d, sd.d) AS day, n_orders, n_shipped,
             (od.d IS NULL OR sd.d IS NULL) AS one_sided
      FROM (SELECT o_orderdate AS d, COUNT(*) AS n_orders
            FROM orders GROUP BY 1) od
      FULL OUTER JOIN
           (SELECT l_shipdate AS d, COUNT(*) AS n_shipped
            FROM lineitem GROUP BY 1) sd
        ON od.d = sd.d
      ORDER BY day
    """))

  /** rank() + dense_rank() with REAL ties [X13]: many orders share an
    * order date within a priority, so rank ≠ dense_rank ≠ row_number is
    * actually exercised (q08 covers row_number). dense_rank ≤ 3 keeps the
    * three earliest order dates per priority — a deterministic row set
    * even with ties (no tiebreak column needed for rank semantics).
    */
  val q59 = GraftQuery(
    "q59_rank_dense_rank",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate"))
      t(s, d, "orders")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("drnk") <= 3)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate"), col("rnk"), col("drnk"))
        .orderBy(col("o_orderpriority"), col("o_orderdate"),
          col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, o_orderdate,
             CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk
      FROM (
        SELECT o_orderkey, o_orderpriority, o_orderdate,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate))
      WHERE drnk <= 3
      ORDER BY o_orderpriority, o_orderdate, o_orderkey
    """))

  /** RIGHT OUTER join [X8]: every part kept against ONE MONTH of
    * shipments — most parts ship nothing that month, so the right join
    * genuinely null-extends (count(l_orderkey) = 0 for them; an inner
    * join would drop them). Fact side is filter-pruned before the join.
    */
  val q60 = GraftQuery(
    "q60_right_join_unshipped",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-03-01")) &&
          col("l_shipdate") < to_timestamp(lit("1995-04-01")))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"),
          "right")
        .groupBy(col("p_partkey"), col("p_name"))
        .agg(count(col("l_orderkey")).as("n_lines"))
        .filter(col("n_lines") <= 1)
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, p_name, COUNT(l_orderkey) AS n_lines
      FROM (SELECT * FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1995-03-01'
              AND l_shipdate <  TIMESTAMP '1995-04-01') l
      RIGHT JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey, p_name
      HAVING COUNT(l_orderkey) <= 1
      ORDER BY p_partkey
    """))

  /** X2 stragglers: get_json_object over a JSON document column and
    * map_keys / element_at over a real MapType column. The JSON/map round
    * trip makes the oracle a genuine semantics check: the extracted
    * values must equal the base columns they were built from.
    */
  val q61 = GraftQuery(
    "q61_json_map_scalars",
    (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 100)
        .withColumn("j", to_json(struct(
          col("l_returnflag").as("f"), col("l_quantity").as("q"))))
        .withColumn("m", map(
          lit("qty"), col("l_quantity"), lit("tax"), col("l_tax")))
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          get_json_object(col("j"), "$.f").as("flag"),
          get_json_object(col("j"), "$.q").cast("double").as("qty_json"),
          concat_ws(",", map_keys(col("m"))).as("mkeys"),
          element_at(col("m"), "tax").as("tax_val"),
          size(col("m")).as("m_size"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_partkey,
             l_returnflag AS flag,
             CAST(l_quantity AS DOUBLE) AS qty_json,
             'qty,tax' AS mkeys,
             l_tax AS tax_val,
             2 AS m_size
      FROM lineitem
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber, l_partkey
    """))

  /** Remaining analytic-window surface [X13/X14]: ntile, percent_rank,
    * cume_dist, lead, and a framed first_value in one pass — one shuffle
    * on the partition key serves all five (same window spec).
    */
  val q64 = GraftQuery(
    "q64_window_analytics",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") < 200)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          first(col("o_orderkey")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("top_key"))
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
          col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
             round(PERCENT_RANK() OVER w, 6) AS pct_rank,
             round(CUME_DIST() OVER w, 6) AS cdist,
             LEAD(o_orderkey, 1) OVER w AS next_key,
             FIRST_VALUE(o_orderkey) OVER
               (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_key
      FROM orders
      WHERE o_custkey < 200
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey
    """))

  val all: Seq[GraftQuery] = Seq(q58, q59, q60, q61, q64)
}
