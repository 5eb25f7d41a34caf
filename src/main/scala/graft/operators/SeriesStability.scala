package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X162 — series stability profile: Fano factor + lag-1
  * autocorrelation of each feed's hourly-count series (Fano 1947 for
  * the dispersion index; Box & Jenkins for the ACF estimator) — the
  * two numbers that separate the three shapes a volume monitor must
  * tell apart: a POISSON-ish healthy feed (Fano ≈ 1, acf1 ≈ 0), a
  * BURSTY/clumped one (Fano ≫ 1 — batch replays, bot storms), and a
  * DRIFTING/seasonal one (acf1 → 1 — the signal X143's CUSUM then
  * localizes). X85's χ² compares two windows; this characterizes one
  * series' internal texture.
  *
  * Determinism: everything reduces to exact long sums over the hourly
  * frame — n, S1 = Σx, S2 = Σx², P = Σ x_t·x_{t+1} (consecutive
  * OBSERVED hours — the estimator is over the observed series; compose
  * with X128's gap-fill for a zero-filled grid), and the boundary
  * counts x_first/x_last — then ONE FIXED double tree per statistic
  * (the X125 idiom: identical exact-integer leaves + identical IEEE op
  * order = identical bits in both engines):
  *   fano = (n·S2 − S1²) / (n·S1),
  *   acf1 = (P − μ·(2S1 − x_f − x_l) + (n−1)·μ²) / (S2 − n·μ²),
  * μ = S1/n; a constant series has den exactly 0 → acf1 NULL (stated).
  *
  * Shape: ONE map-side-combined groupBy to the |types × hours| frame,
  * one per-type lead window on that dimension frame, one groupBy to
  * |types| rows. Scan-bound by construction.
  */
object SeriesStability {

  /** q202 — per-type Fano factor and lag-1 autocorrelation. */
  val q202 = GraftQuery(
    "q202_series_stability", {
      (s, d) => {
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("xn", lead(col("x"), 1).over(w))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2"),
            sum(col("x") * col("xn")).as("p"),
            min(struct(col("h"), col("x"))).as("fst"),
            max(struct(col("h"), col("x"))).as("lst"))
          .select(col("g"), col("n").as("n_hours"),
            col("s1").as("n_events"), col("s2"), col("p"),
            col("fst.x").as("xf"), col("lst.x").as("xl"))
          .withColumn("mean",
            expr("cast(n_events as double) / cast(n_hours as double)"))
          .withColumn("fano", expr(
            "cast(n_hours * s2 - n_events * n_events as double) " +
              "/ cast(n_hours * n_events as double)"))
          .withColumn("acf1_den", expr(
            "cast(s2 as double) - cast(n_hours as double) * mean * mean"))
          .withColumn("acf1", expr(
            "case when acf1_den != 0.0 then " +
              "(cast(p as double) - mean * " +
              "cast(2 * n_events - xf - xl as double) " +
              "+ cast(n_hours - 1 as double) * mean * mean) / acf1_den " +
              "end"))
          .select(col("g"), col("n_hours"), col("n_events"),
            col("mean"), col("fano"), col("acf1"))
          .orderBy(col("g"))
      }
    },
    Some("""
      WITH hourly AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      led AS (
        SELECT g, h, x,
               LEAD(x, 1) OVER (PARTITION BY g ORDER BY h) AS xn
        FROM hourly),
      sums AS (
        SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS BIGINT) AS s2,
               CAST(SUM(x * xn) AS BIGINT) AS p,
               arg_min(x, h) AS xf, arg_max(x, h) AS xl
        FROM led GROUP BY 1)
      SELECT g, n AS n_hours, s1 AS n_events,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(n * s2 - s1 * s1 AS DOUBLE)
               / CAST(n * s1 AS DOUBLE) AS fano,
             CASE WHEN CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) != 0.0
               THEN (CAST(p AS DOUBLE)
                 - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * CAST(2 * s1 - xf - xl AS DOUBLE)
                 + CAST(n - 1 AS DOUBLE)
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                / (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE)
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             END AS acf1
      FROM sums
      ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q202)
}
