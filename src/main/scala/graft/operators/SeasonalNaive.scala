package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X164 — seasonal-naive forecastability audit (the MASE scaling of
  * Hyndman & Koehler, "Another look at measures of forecast accuracy",
  * IJF 2006): per feed, the in-sample MAE of the seasonal-naive
  * forecast x̂_t = x_{t−24} against the MAE of the one-step naive
  * x̂_t = x_{t−1} over the hourly-count series. Their ratio is the
  * number a capacity forecaster reads FIRST: « 1 means the feed has
  * strong daily seasonality (yesterday-same-hour beats last-hour — a
  * seasonal model will pay off), ≈ 1 means a random-walk-ish feed
  * where no seasonal model will help, and it composes with X162 (acf1
  * says drift exists; this says whether the 24 h cycle explains it).
  *
  * Determinism: both error sums are exact longs (Σ|x_t − x_lag| over
  * integer counts); the ratio and per-step MAEs are each ONE fixed
  * double tree over those longs (the X125 idiom). Series shorter than
  * the season emit NULLs (stated, not hidden).
  *
  * Shape: one map-side-combined groupBy to the |types × hours| frame,
  * one per-type window pass computing BOTH lags, one groupBy to
  * |types| rows. Defined on the OBSERVED hourly grid — compose with
  * X128's gap-fill for a zero-filled one (the X162 convention).
  */
object SeasonalNaive {

  /** Season length in hours (daily cycle). */
  val Season = 24

  /** q204 — per-type seasonal-naive vs naive-1 MAE and their ratio. */
  val q204 = GraftQuery(
    "q204_seasonal_naive", {
      (s, d) => {
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("l1", lag(col("x"), 1).over(w))
          .withColumn("ls", lag(col("x"), Season).over(w))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_hours"),
            count(col("l1")).as("n1"),
            count(col("ls")).as("ns"),
            sum(abs(col("x") - col("l1"))).as("sae1"),
            sum(abs(col("x") - col("ls"))).as("saes"))
          .withColumn("mae_naive1",
            expr("cast(sae1 as double) / cast(n1 as double)"))
          .withColumn("mae_seasonal",
            expr("cast(saes as double) / cast(ns as double)"))
          .withColumn("mase_ratio", expr(
            "case when ns > 0 and sae1 > 0 then " +
              "(cast(saes as double) / cast(ns as double)) / " +
              "(cast(sae1 as double) / cast(n1 as double)) end"))
          .select(col("g"), col("n_hours"), col("n1"), col("ns"),
            col("sae1"), col("saes"), col("mae_naive1"),
            col("mae_seasonal"), col("mase_ratio"))
          .orderBy(col("g"))
      }
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      lagged AS (
        SELECT g, x,
               lag(x, 1) OVER w AS l1,
               lag(x, $Season) OVER w AS ls
        FROM hourly
        WINDOW w AS (PARTITION BY g ORDER BY h))
      SELECT g, COUNT(*) AS n_hours,
             COUNT(l1) AS n1, COUNT(ls) AS ns,
             CAST(SUM(abs(x - l1)) AS BIGINT) AS sae1,
             CAST(SUM(abs(x - ls)) AS BIGINT) AS saes,
             CAST(SUM(abs(x - l1)) AS DOUBLE) / CAST(COUNT(l1) AS DOUBLE)
               AS mae_naive1,
             CAST(SUM(abs(x - ls)) AS DOUBLE) / CAST(COUNT(ls) AS DOUBLE)
               AS mae_seasonal,
             CASE WHEN COUNT(ls) > 0 AND SUM(abs(x - l1)) > 0 THEN
               (CAST(SUM(abs(x - ls)) AS DOUBLE)
                 / CAST(COUNT(ls) AS DOUBLE))
               / (CAST(SUM(abs(x - l1)) AS DOUBLE)
                 / CAST(COUNT(l1) AS DOUBLE))
             END AS mase_ratio
      FROM lagged
      GROUP BY 1
      ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q204)
}
