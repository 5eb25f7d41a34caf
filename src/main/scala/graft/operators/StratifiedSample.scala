package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X173 — stratified sampling with exact largest-remainder allocation
  * (Neyman, JRSS 1934, proportional case; the Hamilton/Vinton
  * apportionment rule for the integer rounding): draw a FIXED total
  * of n rows, allocated across strata proportionally to their mass,
  * every quota an integer, quotas summing to exactly n — the eval-set
  * / labeling-budget draw where "1000 examples, representative by
  * (returnflag, linestatus)" must mean exactly 1000, not
  * Bernoulli-approximately 1000 (X5's seeded sample is the
  * per-row-rate form; this is the fixed-budget form).
  *
  * Allocation is pure integer arithmetic, so the hash contract is
  * exact: quota_h = ⌊n·N_h/N⌋ plus one extra for the (n − Σ⌊·⌋)
  * largest remainders, remainders compared as n·N_h mod N (integers —
  * no division anywhere), ties broken by stratum key. Membership is
  * the h60 order (X75 idiom): each stratum takes its quota's prefix
  * of rows ordered by (h60(key), key) — deterministic, uniform within
  * stratum, and REPRODUCIBLE: re-running the draw on the same corpus
  * returns the same sample, and within a stratum a larger quota only
  * EXTENDS the picked prefix. (The quotas themselves are Hamilton
  * quotas and inherit the Alabama paradox — growing n can shrink one
  * stratum's quota by a row; stated, not hidden, because every
  * quota-sums-to-exactly-n rule provably trades one of monotonicity /
  * quota-respect away, Balinski & Young 1982.)
  *
  * Scale shape: one map-side groupBy to the |strata| frame, the
  * allocation entirely on that broadcast-sized frame (two windows on
  * |strata| rows), then one broadcast join back + a per-stratum
  * row_number window. That window's sort is the operator's cost; at
  * 100 TB the quota prefix makes it a per-stratum TakeOrdered heap of
  * quota_h rows, never a full sort (and quotas are budget-sized by
  * definition).
  */
object StratifiedSample {

  /** Total sample budget. */
  val SampleN = 1000L

  /** Draw exactly min(n, |rows|) rows from (g1, g2, k1, k2)-shaped
    * `rows`, Hamilton-allocated across (g1, g2) strata. Columns:
    * g1, g2, n_h, quota, k1, k2, rk.
    */
  def draw(rows: DataFrame, n: Long): DataFrame = {
    val strata = rows.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_h"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val alloc = strata
      .withColumn("n_total", sum(col("n_h")).over(wAll))
      .withColumn("floor_q", expr(s"($n * n_h) div n_total"))
      .withColumn("rem", expr(s"($n * n_h) % n_total"))
      .withColumn("leftover",
        lit(n) - sum(col("floor_q")).over(wAll))
      .withColumn("rem_rk", row_number().over(
        Window.orderBy(col("rem").desc, col("g1"), col("g2"))))
      .withColumn("quota",
        col("floor_q") +
          when(col("rem_rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("g1"), col("g2"), col("n_h"), col("quota"))
    val keyed = rows.withColumn("h",
      expr("cast(conv(substring(md5(concat(cast(k1 as string), ':', " +
        "cast(k2 as string), ':samp')), 1, 15), 16, 10) as bigint)"))
    // r19 optimization: the former per-stratum row_number window
    // sorted every stratum's FULL row set to keep quota ≤ n rows
    // (WindowGroupLimit cannot fire on a data-dependent `rk <= quota`
    // bound). Cap each stratum to its top-n first through the native
    // TopKPerGroup heap operator (n ≥ every quota since Σquota = n) —
    // per-partition k-row heaps, no full sort — then rank the ≤n
    // survivors per stratum and apply the exact quota. The kept rows
    // and their ranks are identical: ranking a prefix-closed superset
    // preserves the prefix's row_numbers under the same total order.
    val capped = graft.plans.TopK.perGroup(
      keyed.join(broadcast(alloc), Seq("g1", "g2")),
      groupCols = Seq(col("g1"), col("g2")),
      orderCols = Seq(col("h"), col("k1"), col("k2")),
      k = n.toInt)
    capped
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g1"), col("g2"))
          .orderBy(col("h"), col("k1"), col("k2"))))
      .filter(col("rk") <= col("quota"))
      .select(col("g1"), col("g2"), col("n_h"), col("quota"),
        col("k1"), col("k2"), col("rk"))
      .orderBy(col("g1"), col("g2"), col("rk"))
  }

  /** q212 — exactly 1000 lineitem rows stratified by (flag, status). */
  val q212 = GraftQuery(
    "q212_stratified_sample", {
      (s, d) =>
        draw(t(s, d, "lineitem")
          .select(col("l_returnflag").as("g1"), col("l_linestatus").as("g2"),
            col("l_orderkey").as("k1"), col("l_linenumber").as("k2")),
          SampleN)
    },
    Some(s"""
      WITH rows_k AS (
        SELECT l_returnflag AS g1, l_linestatus AS g2,
               l_orderkey AS k1, l_linenumber AS k2
        FROM lineitem),
      strata AS (
        SELECT g1, g2, COUNT(*) AS n_h FROM rows_k GROUP BY g1, g2),
      floored AS (
        SELECT g1, g2, n_h,
               ($SampleN * n_h) // SUM(n_h) OVER () AS floor_q,
               ($SampleN * n_h) % SUM(n_h) OVER () AS rem
        FROM strata),
      alloc AS (
        SELECT g1, g2, n_h,
               floor_q + CASE WHEN rem_rk <= leftover THEN 1 ELSE 0 END
                 AS quota
        FROM (
          SELECT g1, g2, n_h, floor_q,
                 $SampleN - SUM(floor_q) OVER () AS leftover,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, g1, g2) AS rem_rk
          FROM floored)),
      keyed AS (
        SELECT g1, g2, k1, k2,
               CAST('0x' || substr(md5(concat(CAST(k1 AS VARCHAR), ':',
                 CAST(k2 AS VARCHAR), ':samp')), 1, 15) AS BIGINT) AS h
        FROM rows_k)
      SELECT k.g1, k.g2, a.n_h, CAST(a.quota AS BIGINT) AS quota,
             k.k1, k.k2, CAST(k.rk AS INTEGER) AS rk
      FROM (
        SELECT g1, g2, k1, k2,
               ROW_NUMBER() OVER (PARTITION BY g1, g2
                 ORDER BY h, k1, k2) AS rk
        FROM keyed) k
      JOIN alloc a ON a.g1 = k.g1 AND a.g2 = k.g2
      WHERE k.rk <= a.quota
      ORDER BY k.g1, k.g2, rk
    """))

  val all: Seq[GraftQuery] = Seq(q212)
}
