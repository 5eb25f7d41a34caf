package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X256 — Kaplan–Meier product-limit curves (Kaplan & Meier 1958) for
  * the two conversion arms q273's log-rank compares: the log-rank
  * says WHETHER the curves differ, KM says WHAT they look like —
  * Ŝ(t) = Π_{v≤t}(1 − d_v/r_v) per arm, the estimate every
  * conversion-latency dashboard actually plots, with censoring
  * handled the only defensible way (a user who hasn't converted YET
  * thins the risk set instead of vanishing). One row per (arm, death
  * time), with the median-crossing marked.
  *
  * Determinism: spans/census/risk sets are the SHARED
  * [[LogRank.spans]]/[[LogRank.timeCensus]]/[[LogRank.withRisk]]
  * machinery (eager census, two-level bucketed swap — the A/B and
  * the curves cannot drift); the product rides one ln per row
  * (1 − d/r from exact longs), a cumulative DECIMAL(30,14) lane
  * inside an ARM-partitioned window over the |death times| frame,
  * and one exp per row; an absorbing-zero lane (running count of
  * d = r blocks) pins Ŝ = 0 exactly after the risk set empties
  * (exp(Σln) would drift). The median flag is the first row whose
  * rounded Ŝ ≤ 0.5 with the previous rounded Ŝ > 0.5.
  *
  * Scale shape: the q273 lineage (one scan → eager |times| census →
  * swap) then a melt to 2·|death times| rows and two arm-partitioned
  * windows on that dimension frame. No single-partition window over
  * anything corpus-growing.
  */
object KaplanMeier {

  /** q287 — per-arm product-limit conversion curves. */
  val q287 = GraftQuery(
    "q287_kaplan_meier", {
      (s, d) => {
        val risky = LogRank.withRisk(LogRank.timeCensus(
          t(s, d, "events")))
        val melted = risky
          .select(col("v"), expr(
            "stack(2, 0L, d0, r0, 1L, d1, r1) AS (g, dd, rr)"))
          .filter(col("dd") > 0L)
        val w = Window.partitionBy(col("g")).orderBy(col("v"))
        val wc = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val curve = melted
          .withColumn("lnterm",
            when(col("dd") < col("rr"),
              log(lit(1.0d) - col("dd").cast("double") /
                col("rr").cast("double")))
              .otherwise(lit(0.0d)).cast("decimal(30,14)"))
          .withColumn("lnsum", sum(col("lnterm")).over(wc))
          .withColumn("zeros",
            sum(when(col("dd") >= col("rr"), 1L).otherwise(0L))
              .over(wc))
          .withColumn("surv",
            when(col("zeros") > 0L, lit(0.0d))
              .otherwise(exp(col("lnsum").cast("double"))))
          .withColumn("surv_r", round(col("surv"), 6))
          .withColumn("prev_r",
            coalesce(lag(col("surv_r"), 1).over(w), lit(1.0d)))
        curve
          .select(col("g").as("arm"), col("v").as("t"),
            col("rr").as("at_risk"), col("dd").as("deaths"),
            col("surv_r"),
            (col("surv_r") <= 0.5d && col("prev_r") > 0.5d)
              .as("median_crossed"))
          .orderBy(col("arm"), col("t"))
      }
    },
    Some(s"""
      WITH peruser AS (
        SELECT user_id % 2 AS g, user_id,
               MIN(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                 // 3600) AS h0,
               MAX(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                 // 3600) AS h_last,
               MIN(CASE WHEN event_type = 'purchase' THEN
                 CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
               END) AS h_conv
        FROM events GROUP BY 1, 2),
      spans AS (
        SELECT g,
               CASE WHEN h_conv IS NOT NULL THEN 1 ELSE 0 END AS event,
               CASE WHEN h_conv IS NOT NULL THEN h_conv - h0
                 ELSE h_last - h0 END AS v
        FROM peruser),
      census AS (
        SELECT v,
               CAST(SUM(CASE WHEN g = 0 AND event = 1 THEN 1 ELSE 0
                 END) AS BIGINT) AS d0,
               CAST(SUM(CASE WHEN g = 1 AND event = 1 THEN 1 ELSE 0
                 END) AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS e0,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS e1
        FROM spans GROUP BY v),
      totals AS (
        SELECT CAST(SUM(e0) AS BIGINT) AS tot0,
               CAST(SUM(e1) AS BIGINT) AS tot1
        FROM census),
      risky AS (
        SELECT c.v, c.d0, c.d1,
               CAST(t.tot0 - COALESCE(SUM(c.e0) OVER (ORDER BY c.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS r0,
               CAST(t.tot1 - COALESCE(SUM(c.e1) OVER (ORDER BY c.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS r1
        FROM census c CROSS JOIN totals t),
      melted AS (
        SELECT CAST(0 AS BIGINT) AS g, v, d0 AS dd, r0 AS rr
        FROM risky WHERE d0 > 0
        UNION ALL
        SELECT CAST(1 AS BIGINT) AS g, v, d1 AS dd, r1 AS rr
        FROM risky WHERE d1 > 0),
      curve AS (
        SELECT g, v, dd, rr,
               SUM(CAST(CASE WHEN dd < rr THEN
                 ln(1.0 - CAST(dd AS DOUBLE) / CAST(rr AS DOUBLE))
                 ELSE 0.0 END AS DECIMAL(30,14))) OVER w AS lnsum,
               SUM(CASE WHEN dd >= rr THEN 1 ELSE 0 END) OVER w
                 AS zeros
        FROM melted
        WINDOW w AS (PARTITION BY g ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      rounded AS (
        SELECT g, v, dd, rr,
               round(CASE WHEN zeros > 0 THEN 0.0
                 ELSE exp(CAST(lnsum AS DOUBLE)) END, 6) AS surv_r
        FROM curve)
      SELECT g AS arm, v AS t, rr AS at_risk, dd AS deaths, surv_r,
             surv_r <= 0.5 AND
               COALESCE(LAG(surv_r) OVER (PARTITION BY g ORDER BY v),
                 1.0) > 0.5 AS median_crossed
      FROM rounded
      ORDER BY arm, t
    """))

  val all: Seq[GraftQuery] = Seq(q287)
}
