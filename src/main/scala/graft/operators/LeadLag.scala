package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X180 — lead-lag finder over paired event-series (the
  * cross-correlogram argmax; Box & Jenkins 1970's CCF read at
  * integer lags): for every ordered pair of event types (a, b),
  * which shift l ∈ [−MaxLag, +MaxLag] hours best aligns their hourly
  * count series under score_l = Σ_t a_t·b_{t−l} — output columns are
  * g_a/g_b, assigned purely by alphabetical order of the two types
  * (NOT by which one leads); only the lag SIGN carries direction:
  * g_a LEADING g_b by 2 hours (g_b repeats g_a's spikes 2 hours
  * later) surfaces as lag = −2, g_b leading g_a as lag = +2. The
  * causality-HINT gauge completing the monitoring tier: X162 says a
  * feed is bursty, X164 says it is daily-periodic, this says which
  * feed LEADS which.
  *
  * Deterministic alignment score instead of the textbook normalized
  * CCF: raw co-movement Σ_t a_t·b_{t+l} over exact long counts —
  * monotone in the CCF numerator for fixed overlap and exactly
  * computable, where the normalized form's per-lag mean/variance
  * divisions would stack engine-dependent float trees 25 deep. The
  * overlap count rides along so a reader can spot edge-dominated
  * lags; best lag = the total (score desc, lag, overlap) argmax.
  *
  * Scale shape: one map-side groupBy to the |types × hours| frame,
  * then a (2·MaxLag+1)-way self-join of THAT dimension frame on the
  * shifted hour (hours grow with wall time, not volume — the X143/
  * X162/X164 economics), one groupBy to |pairs|·|lags|, one argmax
  * window to |pairs| rows.
  */
object LeadLag {

  val MaxLag = 6

  /** q218 — best alignment lag per ordered event-type pair. */
  val q218 = GraftQuery(
    "q218_lead_lag", {
      (s, d) => {
        val hours = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L)
              .cast("long").as("h"))
          .agg(count(lit(1)).as("x"))
        val lags = (-MaxLag to MaxLag).map(lit(_))
        val shifted = hours.select(col("g"), col("h"), col("x"),
          explode(array(lags: _*)).as("l"))
        val joined = hours.as("a")
          .join(shifted.as("b"),
            col("a.h") === col("b.h") + col("b.l") &&
              col("a.g") < col("b.g"))
          .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"),
            col("b.l").as("lag"))
          .agg(sum(col("a.x") * col("b.x")).as("score"),
            count(lit(1)).as("overlap_hours"))
        joined
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("g_a"), col("g_b"))
              .orderBy(col("score").desc, col("lag"),
                col("overlap_hours"))))
          .filter(col("rk") === 1)
          .select(col("g_a"), col("g_b"), col("lag"),
            col("score"), col("overlap_hours"))
          .orderBy(col("g_a"), col("g_b"))
      }
    },
    Some(s"""
      WITH hours AS (
        SELECT event_type AS g,
               epoch(date_trunc('hour', ts)) // 3600 AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      shifted AS (
        SELECT g, h, x, l
        FROM hours, (SELECT unnest(range(-$MaxLag, ${MaxLag + 1})) AS l)),
      joined AS (
        SELECT a.g AS g_a, b.g AS g_b, b.l AS lag,
               CAST(SUM(a.x * b.x) AS BIGINT) AS score,
               COUNT(*) AS overlap_hours
        FROM hours a JOIN shifted b
          ON a.h = b.h + b.l AND a.g < b.g
        GROUP BY 1, 2, 3)
      SELECT g_a, g_b, CAST(lag AS INTEGER) AS lag, score,
             overlap_hours
      FROM (
        SELECT g_a, g_b, lag, score, overlap_hours,
               ROW_NUMBER() OVER (PARTITION BY g_a, g_b
                 ORDER BY score DESC, lag, overlap_hours) AS rk
        FROM joined)
      WHERE rk = 1
      ORDER BY g_a, g_b
    """))

  val all: Seq[GraftQuery] = Seq(q218)
}
