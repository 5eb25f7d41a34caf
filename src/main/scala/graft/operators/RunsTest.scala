package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X215 — Wald–Wolfowitz runs test (Wald & Wolfowitz 1940) on each
  * event type's daily-volume series against its own median: is the
  * sequence of above/below-median days RANDOM, or does it clump
  * (regimes, weekly waves) / alternate (overcorrection)? The
  * randomness companion to the trend tier — X202's Mann–Kendall asks
  * "is it drifting", X197's Ljung–Box asks "is it autocorrelated at
  * fixed lags"; the runs test is the distribution-free omnibus
  * "is it even random" gate, sensitive to clustering either way.
  *
  * Determinism: the median is kept DOUBLED (x_⌈n/2⌉ + x_⌊n/2⌋₊₁ of
  * the value-ranked series — an exact long, no .5 ever), sides are
  * strict integer comparisons (days AT the median are excluded, the
  * classical treatment), run starts come from a lag over the
  * canonical day order, and z is one fixed double tree over the
  * (n₁, n₂, R) longs. One-sided series (n₁ = 0 or n₂ = 0) → NULL z.
  *
  * Scale shape: one map-side groupBy to the |types × days| frame;
  * both windows (value rank for the median, day order for the lag)
  * are PARTITIONED by type on that dimension frame. Corpus touched
  * once.
  */
object RunsTest {

  /** q248 — per-type randomness of the above/below-median day series. */
  val q248 = GraftQuery(
    "q248_runs_test", {
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            epochDay(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val wv = Window.partitionBy(col("g"))
          .orderBy(col("x"), col("day"))
        val cw = Window.partitionBy(col("g"))
        val med = daily
          .withColumn("rn", row_number().over(wv))
          .withColumn("n", count(lit(1)).over(cw))
          // doubled median: lo = (n+1) div 2, hi = n div 2 + 1 pick the
          // same row when n is odd (counted twice), the two middles
          // when even — med2 is always an exact long
          // Column `/` is DOUBLE division — the div must be integral
          // or the lo pick lands on rank 15.5 and never matches
          .withColumn("med_part",
            when(col("rn") === expr("(n + 1) div 2"), col("x"))
              .otherwise(0L) +
              when(col("rn") === expr("n div 2") + 1L, col("x"))
                .otherwise(0L))
          .groupBy(col("g")).agg(sum(col("med_part")).as("med2"))
        val sided = daily.join(med, "g")
          .filter(col("x") * 2L =!= col("med2"))
          .withColumn("side",
            when(col("x") * 2L > col("med2"), 1).otherwise(-1))
        val wd = Window.partitionBy(col("g")).orderBy(col("day"))
        val runs = sided
          .withColumn("prev", lag(col("side"), 1).over(wd))
          .groupBy(col("g"))
          .agg(
            sum(when(col("side") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("side") === -1, 1L).otherwise(0L)).as("n2"),
            sum(when(col("prev").isNull ||
              col("side") =!= col("prev"), 1L).otherwise(0L)).as("r"))
        runs
          .withColumn("mu",
            lit(2.0d) * col("n1").cast("double") *
              col("n2").cast("double") /
              (col("n1") + col("n2")).cast("double") + 1.0d)
          // ANSI guard: a single-day sided series would divide by 0
          .withColumn("sig2",
            when(col("n1") + col("n2") > 1L,
              (col("mu") - 1.0d) * (col("mu") - 2.0d) /
                ((col("n1") + col("n2")).cast("double") - 1.0d)))
          .withColumn("z",
            when(col("n1") > 0L && col("n2") > 0L && col("sig2") > 0d,
              round((col("r").cast("double") - col("mu")) /
                sqrt(col("sig2")), 6)))
          .select(col("g").as("event_type"),
            (col("n1") + col("n2")).as("n_days"),
            col("n1").as("n_above"), col("n2").as("n_below"),
            col("r").as("runs"), col("z"),
            (abs(col("z")) > 1.959964d).as("nonrandom"))
          .orderBy(col("event_type"))
      }
    },
    Some("""
      WITH daily AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      ranked AS (
        SELECT g, day, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x, day) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM daily),
      med AS (
        SELECT g,
               SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END
                 + CASE WHEN rn = n // 2 + 1 THEN x ELSE 0 END) AS med2
        FROM ranked GROUP BY g),
      sided AS (
        SELECT d.g, d.day,
               CASE WHEN d.x * 2 > m.med2 THEN 1 ELSE -1 END AS side
        FROM daily d JOIN med m ON m.g = d.g
        WHERE d.x * 2 <> m.med2),
      runs AS (
        SELECT g,
               CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN side = -1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN prev IS NULL OR side <> prev
                 THEN 1 ELSE 0 END) AS BIGINT) AS r
        FROM (SELECT g, side,
                     LAG(side) OVER (PARTITION BY g ORDER BY day)
                       AS prev
              FROM sided) s
        GROUP BY g),
      fin AS (
        SELECT g, n1, n2, r,
               2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE) + 1.0 AS mu
        FROM runs),
      zed AS (
        SELECT g, n1, n2, r, mu,
               CASE WHEN n1 + n2 > 1 THEN (mu - 1.0) * (mu - 2.0)
                 / (CAST(n1 + n2 AS DOUBLE) - 1.0) END AS sig2
        FROM fin)
      SELECT g AS event_type, n1 + n2 AS n_days,
             n1 AS n_above, n2 AS n_below, r AS runs,
             CASE WHEN n1 > 0 AND n2 > 0 AND sig2 > 0 THEN
               round((CAST(r AS DOUBLE) - mu) / sqrt(sig2), 6)
             END AS z,
             ABS(CASE WHEN n1 > 0 AND n2 > 0 AND sig2 > 0 THEN
               round((CAST(r AS DOUBLE) - mu) / sqrt(sig2), 6)
             END) > 1.959964 AS nonrandom
      FROM zed
      ORDER BY event_type
    """))

  val all: Seq[GraftQuery] = Seq(q248)
}
