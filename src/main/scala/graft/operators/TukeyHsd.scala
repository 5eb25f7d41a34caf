package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X254 — Tukey's honestly-significant-difference post-hoc (Tukey
  * 1953; unequal-n form Kramer 1956) on the q238 day-of-week ANOVA:
  * the PARAMETRIC sibling of q272's Dunn — q238's F says "SOME
  * weekday differs in volume level" per event type; HSD says WHICH
  * weekday pairs, at the familywise level the studentized range
  * controls (running 21 t-tests would inflate α exactly the way
  * Dunn's scaladoc warns for ranks). Pair (i,j) is significant when
  * |ȳᵢ − ȳⱼ| > q·√(MSW/2·(1/nᵢ + 1/nⱼ)).
  *
  * The critical value is the studentized-range upper 5 % point
  * q(0.95, k = 7, df = ∞) = 4.17 (Harter 1960 tables; df = ∞ is the
  * q238 convention — the within-group df is ~|days|·|types| at any
  * SF, where the quantile has converged to the published 3-figure
  * value), embedded as the SAME literal on both engines, and emitted
  * only when all seven weekdays are populated (a partial week has a
  * different range distribution — the q238 rule).
  *
  * Determinism: per-(type, dow) n/Σx/Σx² are exact longs from the
  * |types × days| frame; MSW = Σ(qᵈ − sᵈ²/nᵈ)/(n−7) and every pair's
  * diff/threshold are ONE double tree over those longs; the dow
  * census is eagerly materialized (the q240 discipline — the pair
  * self-join and the MSW fold would re-execute it three times).
  *
  * Scale shape: one corpus pass → |types × days| → the eager
  * |types × 7| census → a ≤21-pair self-join of that planning frame.
  */
object TukeyHsd {

  /** q(0.95, 7, ∞), studentized range (Harter 1960). */
  private val Q7 = 4.17d

  /** q285 — pairwise weekday volume contrasts per event type. */
  val q285 = GraftQuery(
    "q285_tukey_hsd", {
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
              .cast("long").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
        val perDow = graft.Checkpoints.eager(daily
          .groupBy(col("g"), col("dow"))
          .agg(count(lit(1)).as("n_d"), sum(col("x")).as("s_d"),
            sum(col("x") * col("x")).as("q_d")))
        val perG = perDow.groupBy(col("g"))
          .agg(count(lit(1)).as("k_eff"), sum(col("n_d")).as("n"),
            sum((col("q_d").cast("double") -
              col("s_d").cast("double") * col("s_d").cast("double") /
                col("n_d").cast("double")).cast("decimal(30,14)"))
              .cast("double").as("ssw"))
        val mi = col("i.s_d").cast("double") / col("i.n_d").cast("double")
        val mj = col("j.s_d").cast("double") / col("j.n_d").cast("double")
        val msw = col("ssw") / (col("n") - 7L).cast("double")
        perDow.as("i")
          .join(perDow.as("j"),
            col("i.g") === col("j.g") && col("i.dow") < col("j.dow"))
          .join(perG.withColumnRenamed("g", "gg"),
            col("i.g") === col("gg"))
          .withColumn("diff", mi - mj)
          .withColumn("hsd",
            when(col("k_eff") === 7L && col("n") > 7L &&
              col("ssw") > 0d,
              lit(Q7) * sqrt(msw / 2.0d *
                (lit(1.0d) / col("i.n_d").cast("double") +
                  lit(1.0d) / col("j.n_d").cast("double")))))
          .select(col("i.g").as("event_type"),
            col("i.dow").as("dow_a"), col("j.dow").as("dow_b"),
            round(mi, 6).as("mean_a_r"), round(mj, 6).as("mean_b_r"),
            round(col("diff"), 6).as("diff_r"),
            round(col("hsd"), 6).as("hsd_r"),
            when(col("hsd").isNotNull, abs(col("diff")) > col("hsd"))
              .as("significant"))
          .orderBy(col("event_type"), col("dow_a"), col("dow_b"))
      }
    },
    Some(s"""
      WITH daily AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      perdow AS (
        SELECT g, day % 7 AS dow, COUNT(*) AS n_d,
               CAST(SUM(x) AS BIGINT) AS s_d,
               CAST(SUM(x * x) AS BIGINT) AS q_d
        FROM daily GROUP BY 1, 2),
      perg AS (
        SELECT g, COUNT(*) AS k_eff, CAST(SUM(n_d) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(q_d AS DOUBLE) - CAST(s_d AS DOUBLE)
                 * CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)
                 AS DECIMAL(30,14))) AS DOUBLE) AS ssw
        FROM perdow GROUP BY g),
      pairs AS (
        SELECT i.g, i.dow AS dow_a, j.dow AS dow_b,
               CAST(i.s_d AS DOUBLE) / CAST(i.n_d AS DOUBLE) AS ma,
               CAST(j.s_d AS DOUBLE) / CAST(j.n_d AS DOUBLE) AS mb,
               CAST(i.n_d AS DOUBLE) AS na, CAST(j.n_d AS DOUBLE) AS nb,
               p.k_eff, p.n, p.ssw
        FROM perdow i
        JOIN perdow j ON j.g = i.g AND i.dow < j.dow
        JOIN perg p ON p.g = i.g)
      SELECT g AS event_type, dow_a, dow_b,
             round(ma, 6) AS mean_a_r, round(mb, 6) AS mean_b_r,
             round(ma - mb, 6) AS diff_r,
             CASE WHEN k_eff = 7 AND n > 7 AND ssw > 0 THEN
               round($Q7 * sqrt(ssw / CAST(n - 7 AS DOUBLE) / 2.0
                 * (1.0 / na + 1.0 / nb)), 6)
             END AS hsd_r,
             CASE WHEN k_eff = 7 AND n > 7 AND ssw > 0 THEN
               ABS(ma - mb) > $Q7 * sqrt(ssw / CAST(n - 7 AS DOUBLE)
                 / 2.0 * (1.0 / na + 1.0 / nb))
             END AS significant
      FROM pairs
      ORDER BY event_type, dow_a, dow_b
    """))

  val all: Seq[GraftQuery] = Seq(q285)
}
