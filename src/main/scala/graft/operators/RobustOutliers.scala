package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X88 — robust dispersion outlier gate (median/MAD): per group, the
  * median and the median absolute deviation, then the share of rows
  * beyond k·MAD. The metric-monitoring workhorse for pipeline
  * telemetry (latency/value spikes per event class): unlike
  * mean/stddev, the breakdown point is 50 % — a burst of corrupt
  * values moves the gate by ~nothing, which is exactly why production
  * alerting uses it (Leys et al., JESP 2013, "Detecting outliers: use
  * MAD, not standard deviation").
  *
  * Determinism: both medians are linear-interpolated exact percentiles
  * over the SAME doubles in both engines (Spark `percentile` ≡ DuckDB
  * `quantile_cont(0.5)` — interpolation is one (a+b)/2 of identical
  * values); deviations compare |x−med| to k·MAD directly on the
  * unrounded doubles (both engines compute the identical expression),
  * and reported ratios use the micro-unit recipe.
  *
  * Scale shape: exact percentile is the one non-combinable aggregate
  * in the engine's set — it sorts within each group partition. Groups
  * here are the |event_type| shards (each ~corpus/5 — the groupBy
  * spreads them across executors); at the 100 TB tier the swap is the
  * X43 GK-sketch percentiles (q75 — mergeable, bounded error) with
  * the same two-pass shape. Pass 2 joins the tiny per-group stats
  * frame back (broadcast), so the corpus moves once per pass.
  */
object RobustOutliers {

  /** Outlier cut in MAD units (1.5 ≈ the boxplot-whisker convention
    * rendered in MADs; k=3 is the usual normal-data choice but the
    * uniform-ish synthetic corpus has no 3-MAD tail at all).
    */
  val K = 1.5

  /** q139 — per-event-type median/MAD gate over the value column. */
  val q139 = GraftQuery(
    "q139_robust_outliers", {
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"),
            count(lit(1)).as("n"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .withColumn("is_out", col("adev") > lit(K) * col("mad"))
          .groupBy(col("event_type"))
          .agg(first(col("n")).as("n"),
            round(first(col("med")), 4).as("med_r"),
            round(first(col("mad")), 4).as("mad_r"),
            sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
          .withColumn("out_ratio_r",
            expr("cast((2000000 * n_outliers + n) div (2 * n) as double)" +
              " / 1000000.0"))
          .select(col("event_type"), col("n"), col("med_r"), col("mad_r"),
            col("n_outliers"), col("out_ratio_r"))
          .orderBy(col("event_type"))
      }
    },
    Some(s"""
      WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med,
               count(*) AS n
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS adev, m.med, m.n
        FROM events e JOIN med m USING (event_type)),
      mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1),
      flagged AS (
        SELECT d.event_type, d.n, d.med, m.mad,
               CASE WHEN d.adev > $K * m.mad THEN 1 ELSE 0 END AS is_out
        FROM dev d JOIN mad m USING (event_type))
      SELECT event_type, n, round(med, 4) AS med_r,
             round(mad, 4) AS mad_r,
             CAST(sum(is_out) AS BIGINT) AS n_outliers,
             CAST((2000000 * sum(is_out) + n) // (2 * n) AS DOUBLE)
               / 1000000.0 AS out_ratio_r
      FROM flagged
      GROUP BY event_type, n, med, mad
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q139)
}
