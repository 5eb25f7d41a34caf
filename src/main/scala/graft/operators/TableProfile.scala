package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q._

/** X87 — table quality profile (the engine-native ANALYZE/data-audit
  * operator): per column, null count + ratio, exact distinct count,
  * and min/max rendered to a common string form — the one-pass summary
  * every ingestion pipeline snapshots per batch to catch schema drift,
  * null floods, and cardinality collapse BEFORE they poison training
  * data downstream (the "data freshness/quality dashboard" face; the
  * drift ALERT is then a join of two profile snapshots).
  *
  * Determinism: counts are exact integers; ratios use the micro-unit
  * recipe; min/max are total-order aggregates (no float summation
  * anywhere); doubles are rendered through the exact decimal cast so
  * both engines print identical strings.
  *
  * Scale shape: ONE pass over the table — every statistic is a
  * map-side-combinable aggregate, computed column-wise in a single
  * wide agg row and unpivoted to the per-column report with a literal
  * stack (|columns| rows); count_distinct adds the only expand cost
  * and swaps to approx_count_distinct at the 100 TB tier with the X44
  * HLL precedent (exact here so the oracle can hash-check).
  */
object TableProfile {

  /** Profile one column to a fixed-shape struct-of-aggregates. */
  private def stats(c: String, render: Column => Column)
      : Seq[Column] = Seq(
    count(lit(1)).as(s"${c}__rows"),
    sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
    countDistinct(col(c)).as(s"${c}__distinct"),
    // aggregate on the NATIVE type, render the result — rendering
    // first would take a LEXICOGRAPHIC min/max of strings ('99999.67'
    // sorts above '104997.88')
    render(min(col(c))).as(s"${c}__min"),
    render(max(col(c))).as(s"${c}__max"))

  /** q138 — lineitem profile over a representative column mix (long,
    * double-as-decimal, string, date-as-string).
    */
  val q138 = GraftQuery(
    "q138_table_profile", {
      (s, d) => {
        val li = t(s, d, "lineitem")
        val dec: Column => Column =
          _.cast("decimal(18,2)").cast("string")
        val raw: Column => Column = _.cast("string")
        val cols = Seq(
          ("l_orderkey", raw), ("l_quantity", dec),
          ("l_extendedprice", dec), ("l_returnflag", raw),
          ("l_shipdate", raw))
        val wide = li.agg(
          cols.flatMap { case (c, r) => stats(c, r) }.head,
          cols.flatMap { case (c, r) => stats(c, r) }.tail: _*)
        // unpivot the single wide row to |columns| report rows
        val stacked = wide.select(expr(
          "stack(" + cols.length + ", " +
            cols.map { case (c, _) =>
              s"'$c', ${c}__rows, ${c}__nulls, ${c}__distinct, " +
                s"${c}__min, ${c}__max"
            }.mkString(", ") +
            ") as (column_name, n_rows, n_nulls, n_distinct, " +
            "min_repr, max_repr)"))
        stacked
          .withColumn("null_ratio_r",
            expr("cast((2000000 * n_nulls + n_rows) div (2 * n_rows) " +
              "as double) / 1000000.0"))
          .select(col("column_name"), col("n_rows"), col("n_nulls"),
            col("null_ratio_r"), col("n_distinct"), col("min_repr"),
            col("max_repr"))
          .orderBy(col("column_name"))
      }
    },
    Some("""
      WITH p AS (
        SELECT * FROM (
          SELECT 'l_orderkey' AS column_name, count(*) AS n_rows,
                 count(*) - count(l_orderkey) AS n_nulls,
                 count(DISTINCT l_orderkey) AS n_distinct,
                 CAST(min(l_orderkey) AS VARCHAR) AS min_repr,
                 CAST(max(l_orderkey) AS VARCHAR) AS max_repr
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
                 count(DISTINCT l_quantity),
                 CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR),
                 CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', count(*),
                 count(*) - count(l_extendedprice),
                 count(DISTINCT l_extendedprice),
                 CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR),
                 CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
                 count(DISTINCT l_returnflag),
                 CAST(min(l_returnflag) AS VARCHAR),
                 CAST(max(l_returnflag) AS VARCHAR)
          FROM lineitem
          UNION ALL
          SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
                 count(DISTINCT l_shipdate),
                 CAST(min(l_shipdate) AS VARCHAR),
                 CAST(max(l_shipdate) AS VARCHAR)
          FROM lineitem))
      SELECT column_name, n_rows, CAST(n_nulls AS BIGINT) AS n_nulls,
             CAST((2000000 * n_nulls + n_rows) // (2 * n_rows) AS DOUBLE)
               / 1000000.0 AS null_ratio_r,
             CAST(n_distinct AS BIGINT) AS n_distinct, min_repr, max_repr
      FROM p
      ORDER BY column_name
    """))

  val all: Seq[GraftQuery] = Seq(q138)
}
