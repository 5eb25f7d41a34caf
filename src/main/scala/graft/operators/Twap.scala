package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** X160 — time-weighted average value (TWAP — the market-data/metering
  * estimator; Berkowitz et al., "The total cost of transactions on the
  * NYSE", J. Finance 1988 is the canonical benchmark use): per
  * (series, day), the average of the last-observation-carried-forward
  * value over TIME, not over events. The plain mean X6 computes is
  * event-weighted — a sensor that reports 100× per second while idle
  * dominates it; TWAP weights each observation by how long it HELD.
  * X149's OHLC gives the day's endpoints/extremes; this gives the
  * level integral between them.
  *
  * Formulation: per (g, day) in (ts, event_id) total order, each
  * event's value holds until the next event (LOCF); the integral is
  * Σ value_centi · hold_us summed EXACTLY in DECIMAL(38,0) (the
  * per-segment product is ≤ 3.3e4 · 8.64e10 ≈ 3e15 — long-safe — but
  * the day SUM can pass 2⁶³, hence decimal, exact and associative in
  * both engines); value_centi = the raw 2-decimal value in exact
  * centi-units (dec·100). The span is last_us − first_us; TWAP is
  * rendered by ONE shared double tree (integral → double, ÷ span,
  * ÷ 100) — identical bits in both engines; single-event days have no
  * span and render NULL (stated, not hidden).
  *
  * Shape: one (g, day)-partitioned lead window (local bounded sorts)
  * + one map-side-combined groupBy to the |series × days| frame — the
  * X149 plan shape exactly, so the two share an exchange at 100 TB.
  */
object Twap {

  /** q200 — per-(type, day) time-weighted average value vs plain mean. */
  val q200 = GraftQuery(
    "q200_twap", {
      (s, d) => {
        val w = Window.partitionBy(col("g"), col("day"))
          .orderBy(col("us"), col("event_id"))
        t(s, d, "events")
          .select(col("event_type").as("g"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            expr("unix_micros(ts)").as("us"), col("event_id"),
            (dec(col("value")) * lit(100)).cast("long").as("v_centi"),
            col("value"))
          .withColumn("hold_us", lead(col("us"), 1).over(w) - col("us"))
          .groupBy(col("g"), col("day"))
          .agg(
            sum((col("v_centi") * col("hold_us"))
              .cast(DecimalType(38, 0))).as("integral"),
            (max(col("us")) - min(col("us"))).as("span_us"),
            count(lit(1)).as("n_events"),
            davg(col("value")).as("event_mean"))
          .withColumn("twap",
            when(col("span_us") > 0,
              col("integral").cast("double") /
                col("span_us").cast("double") / lit(100.0d)))
          .select(col("g"), col("day"), col("n_events"), col("span_us"),
            col("integral").cast("double").as("integral_centi_us"),
            col("twap"), col("event_mean"))
          .orderBy(col("g"), col("day"))
      }
    },
    Some("""
      WITH ev AS (
        SELECT event_type AS g, strftime(ts, '%Y-%m-%d') AS day,
               epoch_us(ts) AS us, event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS v_centi,
               value
        FROM events),
      held AS (
        SELECT g, day, us, v_centi, value,
               LEAD(us, 1) OVER (PARTITION BY g, day
                 ORDER BY us, event_id) - us AS hold_us
        FROM ev)
      SELECT g, day, COUNT(*) AS n_events,
             MAX(us) - MIN(us) AS span_us,
             CAST(SUM(CAST(v_centi * hold_us AS DECIMAL(38,0)))
               AS DOUBLE) AS integral_centi_us,
             CASE WHEN MAX(us) - MIN(us) > 0 THEN
               CAST(SUM(CAST(v_centi * hold_us AS DECIMAL(38,0)))
                 AS DOUBLE) / CAST(MAX(us) - MIN(us) AS DOUBLE) / 100.0
             END AS twap,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS event_mean
      FROM held
      GROUP BY 1, 2
      ORDER BY g, day
    """))

  val all: Seq[GraftQuery] = Seq(q200)
}
