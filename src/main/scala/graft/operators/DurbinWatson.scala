package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X247 — Durbin–Watson statistic (Durbin & Watson 1950) on each
  * event type's hourly-volume series around its own level: the
  * FIRST-ORDER serial-correlation dial the stationarity pair
  * (q274's KPSS, q233's Ljung–Box) brackets from both sides —
  * Ljung–Box tests a whole ACF band, DW is the classical single-lag
  * statistic whose value reads directly as ρ̂ ≈ 1 − DW/2, the number
  * a forecasting/seasonal-naive consumer (q190) actually plugs in.
  * Level model only (residuals from the mean): DW =
  * Σ(eₜ−eₜ₋₁)²/Σeₜ², and eₜ−eₜ₋₁ = xₜ−xₜ₋₁ cancels the mean exactly.
  *
  * Determinism: both sums are EXACT integers — the numerator is
  * Σ(Δx)² over the hour-ordered lag chain, the denominator n·Σx²−Pₙ²
  * (×n) — so DW = n·num/den is one double tree per type; the normal
  * approximation z = (2−DW)·√n/2 (DW ~ N(2, 4/n) under H₀ for the
  * mean-only model) uses the embedded z(0.975) literal. Constant
  * series → NULL.
  *
  * Scale shape: one corpus pass to the |types × hours| census; one
  * type-partitioned lag window on that dimension frame; one
  * ≤|types|-row fold. Corpus touched once.
  */
object DurbinWatson {

  private val Z = 1.9599639845400536d

  /** q276 — per-type lag-1 serial correlation of hourly volume. */
  val q276 = GraftQuery(
    "q276_durbin_watson", {
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            floor(unix_timestamp(date_trunc("hour", col("ts"))) /
              lit(3600.0d)).cast("long").as("h"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        hourly
          .withColumn("prev", lag(col("x"), 1).over(w))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("pn"),
            sum(col("x") * col("x")).as("sxx"),
            sum(when(col("prev").isNotNull,
              (col("x") - col("prev")) * (col("x") - col("prev")))
              .otherwise(0L)).as("num"))
          .withColumn("den",
            col("n") * col("sxx") - col("pn") * col("pn"))
          .withColumn("dw",
            when(col("den") > 0L,
              round(col("n").cast("double") *
                col("num").cast("double") /
                col("den").cast("double"), 6)))
          .withColumn("z",
            when(col("dw").isNotNull,
              round((lit(2.0d) - col("dw")) *
                sqrt(col("n").cast("double")) / 2.0d, 6)))
          .select(col("g").as("event_type"), col("n").as("n_hours"),
            col("dw").as("dw_r"),
            when(col("dw").isNotNull,
              round(lit(1.0d) - col("dw") / 2.0d, 6)).as("rho_r"),
            col("z").as("z_r"),
            (abs(col("z")) > Z).as("autocorrelated"))
          .orderBy(col("event_type"))
      }
    },
    Some(s"""
      WITH hourly AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600
                 AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      lagged AS (
        SELECT g, x,
               LAG(x) OVER (PARTITION BY g ORDER BY h) AS prev
        FROM hourly),
      folded AS (
        SELECT g, COUNT(*) AS n, SUM(x) AS pn, SUM(x * x) AS sxx,
               SUM(CASE WHEN prev IS NOT NULL
                 THEN (x - prev) * (x - prev) ELSE 0 END) AS num
        FROM lagged GROUP BY g),
      calc AS (
        SELECT g, n, pn, sxx, num,
               n * sxx - pn * pn AS den
        FROM folded),
      dws AS (
        SELECT g, n,
               CASE WHEN den > 0 THEN
                 round(CAST(n AS DOUBLE) * CAST(num AS DOUBLE)
                   / CAST(den AS DOUBLE), 6)
               END AS dw
        FROM calc)
      SELECT g AS event_type, CAST(n AS BIGINT) AS n_hours,
             dw AS dw_r,
             CASE WHEN dw IS NOT NULL THEN round(1.0 - dw / 2.0, 6)
               END AS rho_r,
             CASE WHEN dw IS NOT NULL THEN
               round((2.0 - dw) * sqrt(CAST(n AS DOUBLE)) / 2.0, 6)
             END AS z_r,
             ABS(CASE WHEN dw IS NOT NULL THEN
               round((2.0 - dw) * sqrt(CAST(n AS DOUBLE)) / 2.0, 6)
             END) > $Z AS autocorrelated
      FROM dws
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q276)
}
