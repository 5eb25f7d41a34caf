package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X131 — Theil-Sen robust per-series trend: the median of all
  * pairwise slopes of a user's daily revenue series (Theil 1950; Sen,
  * JASA 1968). The trend detector X128's gap-fill makes honest: OLS
  * slopes have a 0 % breakdown point — one corrupt day drags the fit
  * arbitrarily — while the median-of-slopes estimator tolerates ~29 %
  * corrupt observations, which is why monitoring stacks fit trends
  * with it (the same robustness argument as X88's MAD-not-stddev).
  *
  * Shape: the pair face is PER SERIES — Σ_u k_u·(k_u−1)/2 where k_u is
  * the user's OBSERVED-day count, bounded by the event window (≤ ~40
  * days here), never corpus-quadratic; the self-join shuffles obs once
  * on user_id and everything downstream is per-user aggregation. For
  * multi-year series at 100 TB the standard cut is slopes over a
  * bounded day-lag band (same plan, banded join) — documented ceiling,
  * like q140's replicate explode.
  *
  * Determinism: per-day values are exact decimal sums cast to double
  * once; each slope is ONE shared tree (exact-double subtraction over
  * integer day delta cast to double — both IEEE correctly rounded);
  * the median is the exact interpolated percentile (Spark
  * `percentile` ≡ DuckDB `quantile_cont`, the q139/q145 parity).
  */
object TheilSenTrend {

  /** q173 — per-user robust daily-revenue trend (median slope). */
  val q173 = GraftQuery(
    "q173_theil_sen_trend", {
      (s, d) => {
        val obs = t(s, d, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day_no"))
          .agg(dsum(col("value")).as("v"))
        val pairs = obs.as("a")
          .join(obs.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("b.day_no") > col("a.day_no"))
          .select(col("a.user_id").as("user_id"),
            ((col("b.v") - col("a.v")) /
              (col("b.day_no") - col("a.day_no")).cast("double"))
              .as("slope"))
        val trend = pairs.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("percentile(slope, 0.5)").as("trend_slope"))
        obs.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_obs"),
            expr("percentile(v, 0.5)").as("med_value"))
          .join(trend, "user_id") // inner: single-obs series have no slope
          .select(col("user_id"), col("n_obs"), col("n_pairs"),
            col("med_value"), col("trend_slope"))
          .orderBy(col("user_id"))
      }
    },
    Some("""
      WITH obs AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day_no,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2),
      pairs AS (
        SELECT a.user_id,
               (b.v - a.v) / CAST(b.day_no - a.day_no AS DOUBLE) AS slope
        FROM obs a JOIN obs b
          ON a.user_id = b.user_id AND b.day_no > a.day_no),
      tr AS (
        SELECT user_id, COUNT(*) AS n_pairs,
               quantile_cont(slope, 0.5) AS trend_slope
        FROM pairs GROUP BY 1),
      lvl AS (
        SELECT user_id, COUNT(*) AS n_obs,
               quantile_cont(v, 0.5) AS med_value
        FROM obs GROUP BY 1)
      SELECT lvl.user_id, lvl.n_obs, CAST(tr.n_pairs AS BIGINT) AS n_pairs,
             lvl.med_value, tr.trend_slope
      FROM lvl JOIN tr ON tr.user_id = lvl.user_id
      ORDER BY lvl.user_id
    """))

  val all: Seq[GraftQuery] = Seq(q173)
}
