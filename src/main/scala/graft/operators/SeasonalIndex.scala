package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X232 — classical seasonal decomposition by ratio-to-moving-average
  * (Macaulay, NBER 1931; the Census-I kernel every X-11 descendant
  * starts from): per event type, the trend is a CENTERED 7-day moving
  * average of daily counts, and the day-of-week seasonal index is the
  * mean of count/trend ratios at that weekday — "Mondays run 1.3×
  * trend". The DECOMPOSITION companion to the tier's detectors: X205
  * (day-of-week ANOVA) tests that weekday structure EXISTS, X164
  * (seasonal-naive MASE) tests that it forecasts; this one produces
  * the multiplicative indices a capacity plan or an anomaly
  * normalizer actually consumes (X155's rolling z-scores, divided by
  * these, stop flagging every weekend).
  *
  * Determinism: daily counts are exact longs; the trend window is a
  * RANGE window over the day key (±3 calendar days — a ROWS window
  * would silently mis-center wherever a zero-count day is absent from
  * the frame, the X197 observed-series convention), kept only where
  * all 7 days exist; each ratio = 7c/Σ is one double division of
  * exact longs; the per-(type, dow) mean crosses the aggregation as
  * DECIMAL(30,14) lanes (q162) before one final division. dow =
  * epoch-day mod 7 (0 = Thursday, the q238 convention; post-1970
  * data per [[Q.epochDay]]).
  *
  * Scale shape: one scan → the |types × days| census (days grow with
  * wall time, not volume — the X202 economics) → one type-partitioned
  * range window → a ≤|types|·7-row groupBy.
  */
object SeasonalIndex {

  /** q264 — day-of-week multiplicative seasonal indices per event
    * type.
    */
  val q264 = GraftQuery(
    "q264_seasonal_index", {
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), epochDay(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("day")).rangeBetween(-3, 3)
        val ratios = daily
          .withColumn("s7", sum(col("c")).over(w))
          .withColumn("d7", count(lit(1)).over(w))
          .filter(col("d7") === 7L)
          .withColumn("ratio",
            lit(7.0d) * col("c").cast("double") /
              col("s7").cast("double"))
        ratios
          .groupBy(col("event_type"), pmod(col("day"), lit(7L)).as("dow"))
          .agg(count(lit(1)).as("n_days"),
            sum(col("ratio").cast("decimal(30,14)")).cast("double")
              .as("sr"))
          .select(col("event_type"), col("dow"), col("n_days"),
            round(col("sr") / col("n_days").cast("double"), 6)
              .as("idx_r"))
          .orderBy(col("event_type"), col("dow"))
      }
    },
    Some("""
      WITH daily AS (
        SELECT event_type,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      trended AS (
        SELECT event_type, day, c,
               CAST(SUM(c) OVER w AS BIGINT) AS s7,
               COUNT(*) OVER w AS d7
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      ratios AS (
        SELECT event_type, day % 7 AS dow,
               7.0 * CAST(c AS DOUBLE) / CAST(s7 AS DOUBLE) AS ratio
        FROM trended WHERE d7 = 7)
      SELECT event_type, CAST(dow AS BIGINT) AS dow,
             COUNT(*) AS n_days,
             round(CAST(SUM(CAST(ratio AS DECIMAL(30,14))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 6) AS idx_r
      FROM ratios
      GROUP BY 1, 2
      ORDER BY 1, 2
    """))

  val all: Seq[GraftQuery] = Seq(q264)
}
