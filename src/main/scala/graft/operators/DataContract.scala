package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._

/** X139 — data-contract audit (the Great-Expectations/dbt-test tier):
  * declarative expectations over the warehouse — referential
  * integrity, key uniqueness, null rates, value ranges — evaluated to
  * one violations row per contract. This is the gate a training-data
  * warehouse runs BEFORE anything downstream trusts a snapshot: a
  * broken FK silently drops joins (under-counts), a duplicate PK
  * double-counts, both invisible until this audit names them.
  *
  * Shape: each contract is one scan-bound aggregate or one keyed
  * anti-join (dimension side broadcast where small — the q06/q07
  * machinery); the result frame is |contracts| rows. Nothing here
  * exceeds the cost of the cheapest relational query at any scale.
  *
  * Determinism: every output is an exact long count or an exact
  * boolean — no floats anywhere.
  */
object DataContract {

  private def check(name: String, table: String, checked: DataFrame,
      violations: org.apache.spark.sql.Column): DataFrame =
    checked.agg(count(lit(1)).as("n_checked"),
      sum(when(violations, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("contract"), lit(table).as("table_name"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** q180 — the warehouse contract suite as one report frame. */
  val q180 = GraftQuery(
    "q180_data_contract", {
      (s: SparkSession, d: String) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        // FK: every lineitem must reference an existing order
        val fkLi = check("fk_lineitem_orders", "lineitem",
          li.select(col("l_orderkey"))
            .join(o.select(col("o_orderkey")),
              col("l_orderkey") === col("o_orderkey"), "left")
            .select(col("o_orderkey").isNull.as("v")), col("v"))
        // FK: every order must reference an existing customer
        val fkO = check("fk_orders_customer", "orders",
          o.select(col("o_custkey"))
            .join(broadcast(c.select(col("c_custkey"))),
              col("o_custkey") === col("c_custkey"), "left")
            .select(col("c_custkey").isNull.as("v")), col("v"))
        // PK: o_orderkey unique (groupBy to duplicate groups)
        val pk = {
          val dups = o.groupBy(col("o_orderkey"))
            .agg(count(lit(1)).as("k")).filter(col("k") > 1)
          o.agg(count(lit(1)).as("n_checked"))
            .join(broadcast(dups.agg(
              coalesce(sum(col("k")), lit(0L)).as("n_violations"))))
            .select(lit("pk_orders_unique").as("contract"),
              lit("orders").as("table_name"), col("n_checked"),
              col("n_violations"),
              (col("n_violations") === 0L).as("pass"))
        }
        // NOT NULL + ranges
        val nn = check("not_null_o_custkey", "orders",
          o.select(col("o_custkey").isNull.as("v")), col("v"))
        val rDisc = check("range_l_discount_0_0.1", "lineitem",
          li.select((col("l_discount") < 0 || col("l_discount") > 0.1)
            .as("v")), col("v"))
        val rQty = check("range_l_quantity_1_50", "lineitem",
          li.select((col("l_quantity") < 1 || col("l_quantity") > 50)
            .as("v")), col("v"))
        fkLi.unionByName(fkO).unionByName(pk).unionByName(nn)
          .unionByName(rDisc).unionByName(rQty)
          .orderBy(col("contract"))
      }
    },
    Some("""
      SELECT * FROM (
        SELECT 'fk_lineitem_orders' AS contract,
               'lineitem' AS table_name, COUNT(*) AS n_checked,
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_violations,
               SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                 AS pass
        FROM lineitem l LEFT JOIN orders o
          ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'fk_orders_customer', 'orders', COUNT(*),
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'pk_orders_unique', 'orders',
               (SELECT COUNT(*) FROM orders),
               CAST(COALESCE((SELECT SUM(k) FROM (
                 SELECT COUNT(*) AS k FROM orders GROUP BY o_orderkey
                 HAVING COUNT(*) > 1)), 0) AS BIGINT),
               COALESCE((SELECT SUM(k) FROM (
                 SELECT COUNT(*) AS k FROM orders GROUP BY o_orderkey
                 HAVING COUNT(*) > 1)), 0) = 0
        UNION ALL
        SELECT 'not_null_o_custkey', 'orders', COUNT(*),
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT),
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'range_l_discount_0_0.1', 'lineitem', COUNT(*),
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                 THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                 THEN 1 ELSE 0 END) = 0
        FROM lineitem
        UNION ALL
        SELECT 'range_l_quantity_1_50', 'lineitem', COUNT(*),
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                 THEN 1 ELSE 0 END) = 0
        FROM lineitem)
      ORDER BY contract
    """))

  val all: Seq[GraftQuery] = Seq(q180)
}
