package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X184 — rolling z-score anomaly flags (the Shewhart/3-sigma control
  * chart on a trailing window; Shewhart 1931): per (event type, hour)
  * compare the hourly count against the mean/σ of the PREVIOUS 24
  * observed hours — the self-calibrating spike/outage detector
  * between X143 (CUSUM locates ONE level shift) and X85 (χ² compares
  * two fixed windows): this one flags every hour that breaks from its
  * own trailing baseline, per feed, continuously.
  *
  * Exactness: the 3σ test never leaves the integers — flag ⇔
  * n ≥ MinBaseline and (x·n − s)² > 9·(n·ss − s²) over exact long
  * count/sum/sum-of-squares (two-sided by squaring; a zero-variance
  * baseline with x ≠ μ flags, 0 > 0 = false keeps a flat feed
  * quiet). The rendered z itself is one double tree (IEEE sqrt and ÷
  * are correctly rounded — the X126 discipline), NULL on the
  * zero-variance edge. Baseline = previous 24 OBSERVED hours (rows,
  * not wall hours — stated; on a feed with silent hours the gap
  * itself is X128/X138's department).
  *
  * Scale shape: one map-side groupBy to the |types × hours| frame,
  * one type-partitioned 24-row window on THAT frame (the X143/X162/
  * X164 economics), output = the flagged rows only.
  */
object RollingAnomaly {

  /** Minimum trailing observations before the test arms. */
  val MinBaseline = 12

  /** q221 — hours breaking 3σ from their own trailing baseline. */
  val q221 = GraftQuery(
    "q221_rolling_anomaly", {
      (s, d) => {
        val hours = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
          .rowsBetween(-24, -1)
        val tested = hours
          .withColumn("n24", count(lit(1)).over(w))
          .withColumn("s", sum(col("x")).over(w))
          .withColumn("ss", sum(col("x") * col("x")).over(w))
          .withColumn("num", col("x") * col("n24") - col("s"))
          .withColumn("den",
            col("n24") * col("ss") - col("s") * col("s"))
          .filter(col("n24") >= MinBaseline &&
            col("num") * col("num") > lit(9L) * col("den"))
        tested.select(col("g"), col("h"), col("x"), col("n24"),
          col("s").as("base_sum"),
          when(col("den") > 0,
            col("num").cast("double") /
              sqrt(col("den").cast("double"))).as("z"))
          .orderBy(col("g"), col("h"))
      }
    },
    Some(s"""
      WITH hours AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      tested AS (
        SELECT g, h, x,
               COUNT(*) OVER w AS n24,
               CAST(SUM(x) OVER w AS BIGINT) AS s,
               CAST(SUM(x * x) OVER w AS BIGINT) AS ss
        FROM hours
        WINDOW w AS (PARTITION BY g ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      scored AS (
        SELECT g, h, x, n24, s,
               x * n24 - s AS num, n24 * ss - s * s AS den
        FROM tested)
      SELECT g, h, x, n24, s AS base_sum,
             CASE WHEN den > 0 THEN
               CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) END AS z
      FROM scored
      WHERE n24 >= $MinBaseline AND num * num > 9 * den
      ORDER BY g, h
    """))

  val all: Seq[GraftQuery] = Seq(q221)
}
