package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X143 — CUSUM change-point detection over event-rate series (Page,
  * "Continuous Inspection Schemes", Biometrika 1954): the standard
  * level-shift detector every pipeline-health monitor runs on its
  * ingest rates — a feed whose hourly volume steps up or down (a
  * producer deploy, a dropped partition, a bot wave) should surface
  * the WHEN, not just a drifted daily total (X85's χ² says the
  * distribution moved; CUSUM localizes the move in time).
  *
  * Formulation: per type, the hourly-count series x_t is exactly
  * mean-centered in integers as d_t = x_t·H − T (H observed hours,
  * T total events — so Σd = 0 without any division), and the classic
  * recursive CUSUM s_t = max(0, s_{t−1} + d_t) is computed CLOSED-FORM
  * as s_t = P_t − min(0, min_{j≤t} P_j) with P the prefix sum of d —
  * two running windows instead of an inherently sequential fold, which
  * is what makes it a Spark plan at all. The reported change point is
  * the earliest hour attaining the GLOBAL prefix minimum — the last
  * pre-shift hour, Page's max-likelihood location of an upward level
  * shift (the CUSUM maximum itself sits at the series end for a
  * sustained shift, so it is the DETECTION statistic, not the
  * location). One-sided (upward) by construction — run the negated
  * series for downward shifts, as Page prescribes.
  *
  * Determinism: counts, products, prefix sums, running mins — all
  * exact integers; the only per-type outputs are longs and the argmax
  * hour (ties → earliest). Nothing floats.
  *
  * Scale shape: ONE map-side-combined groupBy collapses the corpus to
  * the |types × hours| dimension frame; every window below runs
  * per-type on that frame. At 100 TB the series frame is still
  * dimension-sized (hours grow with wall time, not data volume); a
  * single very long series takes the q149 two-level prefix swap.
  */
object ChangePoint {

  /** q184 — per-type CUSUM census: max statistic + change hour. */
  val q184 = GraftQuery(
    "q184_cusum_changepoint", {
      (s, d) => {
        val hourly = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val wAll = Window.partitionBy(col("g"))
        val wPre = Window.partitionBy(col("g")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hourly
          .withColumn("hh", count(lit(1)).over(wAll))
          .withColumn("tt", sum(col("x")).over(wAll))
          .withColumn("p",
            sum(col("x") * col("hh") - col("tt")).over(wPre))
          .withColumn("cusum",
            col("p") - least(lit(0L), min(col("p")).over(wPre)))
          .withColumn("mp", min(col("p")).over(wAll))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_hours"),
            sum(col("x")).as("n_events"),
            max(col("cusum")).as("max_cusum"),
            min(when(col("p") === col("mp"), col("h")))
              .as("change_hour"))
          .orderBy(col("g"))
      }
    },
    Some("""
      WITH hourly AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      scored AS (
        SELECT g, h, x,
               COUNT(*) OVER (PARTITION BY g) AS hh,
               SUM(x) OVER (PARTITION BY g) AS tt
        FROM hourly),
      pref AS (
        SELECT g, h, x,
               SUM(x * hh - tt) OVER (PARTITION BY g ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        FROM scored),
      cus AS (
        SELECT g, h, x, p,
               p - LEAST(0, MIN(p) OVER (PARTITION BY g ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 AS cusum
        FROM pref),
      mx AS (
        SELECT g, h, x, p, cusum,
               MIN(p) OVER (PARTITION BY g) AS mp
        FROM cus)
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(x) AS BIGINT) AS n_events,
             CAST(MAX(cusum) AS BIGINT) AS max_cusum,
             MIN(CASE WHEN p = mp THEN h END) AS change_hour
      FROM mx GROUP BY g ORDER BY g
    """))

  val all: Seq[GraftQuery] = Seq(q184)
}
