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
  * Scale shape: one single-row aggregation PER COLUMN, unioned —
  * deliberately not one wide agg: multiple exact count_distincts in a
  * single agg make Catalyst EXPAND the input |columns|-fold (measured
  * 7.4 s vs 0.34 s on this very query at sf0.1), while per-column aggs
  * each read exactly one column off parquet (pruned scan) with
  * map-side combine. The same |columns| independent passes pipeline
  * as parallel stages; count_distinct swaps to approx_count_distinct
  * at the 100 TB tier with the X44 HLL precedent (exact here so the
  * oracle can hash-check).
  */
object TableProfile {

  /** One column's single-row profile frame over `table`. */
  private def profileCol(table: DataFrame, c: String,
      render: Column => Column): DataFrame =
    table.select(col(c)).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      // aggregate on the NATIVE type, render the result — rendering
      // first would take a LEXICOGRAPHIC min/max of strings
      // ('99999.67' sorts above '104997.88')
      render(min(col(c))).as("min_repr"),
      render(max(col(c))).as("max_repr"))
      .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_repr"), col("max_repr"))

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
        val stacked = cols
          .map { case (c, r) => profileCol(li, c, r) }
          .reduce(_ unionByName _)
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
