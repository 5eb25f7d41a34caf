package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X101 — Mann–Whitney U rank-sum test (Mann & Whitney 1947; the
  * Wilcoxon two-sample form): the NONPARAMETRIC A/B companion to q142
  * (two-proportion z) and q146 (CUPED means). Metric distributions in
  * data pipelines are heavy-tailed (latencies, doc lengths, revenue
  * per user), where the t-test's mean is fragile; the rank test asks
  * "does one arm stochastically dominate the other" and is the
  * standard robust gate.
  *
  * Determinism: everything up to the final z is INTEGER arithmetic —
  * ranks are kept doubled (2·avgrank = 2·cumBefore + ties + 1, always
  * an integer), so the doubled rank-sum and doubled U are exact longs
  * in both engines; the tie-correction term Σ(t³−t) is an exact long;
  * z is then one shared expression tree over exactly-represented
  * integers (products ≤ ~1e15 < 2^53) with a single sqrt (IEEE
  * correctly-rounded), rounded for report.
  *
  * Scale shape: ranking needs a global value order, but NOT a global
  * single-partition window — the cumulative count is computed with the
  * classic two-level prefix sum: distinct values are range-bucketed
  * (1024 buckets over the observed span), per-bucket totals (a
  * ≤1025-row planning frame) are cumulated with a bounded window and
  * broadcast back, and the within-bucket window is PARTITIONED by
  * bucket. Every corpus-sized stage is a hash agg or a
  * bucket-partitioned window; nothing funnels through one partition.
  */
object RankSum {

  /** Prefix-sum buckets. */
  val Buckets = 1024

  /** The two-level bucketed prefix sum, factored (r18) so X214's
    * Kruskal–Wallis shares it verbatim: adds `cum` — the total of `t`
    * over all strictly-smaller `v` — to a per-distinct-value frame
    * `(v double, t long, …)` with NO global single-partition window
    * (per-bucket totals are a ≤[[Buckets]]+1-row planning frame; the
    * within-bucket window is partitioned by bucket).
    */
  private[operators] def bucketedCum(
      byVal: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val span = byVal.agg(min(col("v")).as("lo"),
      (max(col("v")) - min(col("v"))).as("w"))
    val bucketed = byVal.join(broadcast(span))
      // degenerate span (all values equal) → single bucket; the
      // ANSI cast would otherwise choke on floor(x/0) = Inf
      .withColumn("bkt", when(col("w") > 0d, least(lit(Buckets - 1),
        floor((col("v") - col("lo")) / (col("w") / Buckets))
          .cast("int"))).otherwise(lit(0)))
      .drop("lo", "w")
    val wb = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bkt"))
      .agg(sum(col("t")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wb), lit(0L)))
      .select(col("bkt"), col("off"))
    val wv = Window.partitionBy(col("bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(offsets), "bkt")
      .withColumn("cum",
        col("off") + coalesce(sum(col("t")).over(wv), lit(0L)))
  }

  /** q149 — U test of events.value between arms user_id%2 = 0 (A) and
    * 1 (B): doubled U for arm A, tie count, and the tie-corrected
    * normal-approximation z.
    */
  val q149 = GraftQuery(
    "q149_rank_sum_test", {
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("value").as("v"),
            pmod(col("user_id"), lit(2)).as("grp"))
        // per distinct value: total ties t and arm-A count
        val byVal = ev.groupBy(col("v"))
          .agg(count(lit(1)).as("t"),
            sum(when(col("grp") === 0, 1L).otherwise(0L)).as("na_v"))
        // two-level prefix sum over value order (shared with X214)
        val ranked = bucketedCum(byVal)
          // doubled average rank of this value's tie block — integer
          .withColumn("r2", lit(2L) * col("cum") + col("t") + 1L)
        val agg = ranked.agg(
          sum(col("na_v")).as("n_a"), sum(col("t")).as("n"),
          sum(col("na_v") * col("r2")).as("rs2a"),
          sum(col("t") * col("t") * col("t") - col("t")).as("ties3"))
        agg
          .withColumn("n_b", col("n") - col("n_a"))
          // doubled U_A = doubled rank-sum − n_a(n_a+1)  (exact long)
          .withColumn("u2_a", col("rs2a") - col("n_a") * (col("n_a") + 1L))
          .withColumn("var_u",
            col("n_a").cast("double") * col("n_b").cast("double") / 12.0d *
              ((col("n") + 1L).cast("double") -
                col("ties3").cast("double") /
                  (col("n").cast("double") * (col("n") - 1L).cast("double"))))
          // z = (U_A − n_a·n_b/2)/σ, kept doubled top and bottom
          .withColumn("z",
            (col("u2_a") - col("n_a") * col("n_b")).cast("double") /
              (lit(2.0d) * sqrt(col("var_u"))))
          .select(col("n_a"), col("n_b"), col("u2_a"),
            round(col("z"), 6).as("z_r"),
            (abs(col("z")) > 1.959964d).as("significant"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT value AS v, user_id % 2 AS grp FROM events),
      byval AS (
        SELECT v, count(*) AS t,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS na_v
        FROM ev GROUP BY v),
      ranked AS (
        SELECT t, na_v,
               coalesce(sum(t) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum
        FROM byval),
      agg AS (
        SELECT sum(na_v) AS n_a, sum(t) AS n,
               sum(na_v * (2 * cum + t + 1)) AS rs2a,
               sum(t * t * t - t) AS ties3
        FROM ranked),
      fin AS (
        SELECT n_a, n - n_a AS n_b,
               rs2a - n_a * (n_a + 1) AS u2_a,
               CAST(n_a AS DOUBLE) * CAST(n - n_a AS DOUBLE) / 12.0 *
                 (CAST(n + 1 AS DOUBLE) - CAST(ties3 AS DOUBLE) /
                   (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS var_u,
               n, ties3
        FROM agg)
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(u2_a AS BIGINT) AS u2_a,
             round(CAST(u2_a - n_a * n_b AS DOUBLE) /
               (2.0 * sqrt(var_u)), 6) AS z_r,
             abs(CAST(u2_a - n_a * n_b AS DOUBLE) /
               (2.0 * sqrt(var_u))) > 1.959964 AS significant
      FROM fin
    """))

  val all: Seq[GraftQuery] = Seq(q149)
}
