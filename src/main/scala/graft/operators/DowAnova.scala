package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X203 — day-of-week ANOVA / seasonality strength (Fisher's one-way
  * analysis of variance, Statistical Methods for Research Workers
  * 1925, grouped by weekday): per feed, decompose the daily-volume
  * variance into BETWEEN-weekday and WITHIN-weekday sums of squares:
  *   F = (SSB/(k−1)) / (SSW/(n−k)),   strength = SSB/SST ∈ [0,1]
  * — how much of a feed's day-to-day swing is just "Mondays are
  * Mondays". The decomposition companion to X164's seasonal-naive
  * MASE (which scores FORECASTABILITY at lag 7, one number, no
  * variance split) and the weekly-scale sibling of X198's dyadic
  * energies (a 7-day period is invisible to power-of-two blocks —
  * exactly the gap this fills).
  *
  * Day-of-week = epoch-day mod 7 (engine-neutral pure integer — the
  * two engines' dayofweek() builtins disagree on both origin and
  * range, so neither is used; dow 0 = Thursday, stated, irrelevant to
  * the variance split). Determinism: exact long leaves (per-dow
  * n_d, s_d = Σx, global n, S1, S2), then ONE fixed double tree per
  * statistic with the seven s_d²/n_d terms in dow order 0..6
  * (empty-dow terms guarded to 0). The F verdict is pinned to the
  * F(6,∞) 0.95 quantile = χ²(6)/6 embedded as a literal and emitted
  * ONLY when all seven weekdays are populated (df1 = 6; stated —
  * a partial week has a different null distribution).
  *
  * Scale shape: one map-side groupBy to |types × days|, one
  * conditional-sum groupBy to |types| rows. Scan-bound.
  */
object DowAnova {

  /** F(6, ∞) at 0.95 = χ²(6) 0.95 quantile / 6. */
  val F95: Double = 2.0985978739573295

  private def terms: String =
    (0 to 6).map(d =>
      s"(case when n_$d > 0 then cast(s_$d * s_$d as double) " +
        s"/ cast(n_$d as double) else 0.0 end)").mkString(" + ")

  /** q238 — per-type weekday variance decomposition. */
  val q238 = GraftQuery(
    "q238_dow_anova", {
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
              .cast("long").as("day"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
        val aggs =
          Seq(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x") * col("x")).as("s2")) ++
          (0 to 6).flatMap { dd =>
            Seq(sum(when(col("dow") === dd, 1L).otherwise(0L))
              .as(s"n_$dd"),
              sum(when(col("dow") === dd, col("x")).otherwise(0L))
                .as(s"s_$dd"))
          }
        daily.groupBy(col("g"))
          .agg(aggs.head, aggs.tail: _*)
          .withColumn("groups_sum", expr(terms))
          .withColumn("sst", expr(
            "cast(s2 as double) - cast(s1 as double) * " +
              "cast(s1 as double) / cast(n as double)"))
          .withColumn("ssb", expr(
            "groups_sum - cast(s1 as double) * cast(s1 as double) " +
              "/ cast(n as double)"))
          .withColumn("ssw", expr("cast(s2 as double) - groups_sum"))
          .withColumn("k_eff", expr(
            (0 to 6).map(dd => s"(case when n_$dd > 0 then 1 else 0 end)")
              .mkString(" + ")))
          .withColumn("strength", expr(
            "case when sst != 0.0 then ssb / sst end"))
          .withColumn("f_stat", expr(
            "case when k_eff = 7 and n > 7 and ssw != 0.0 then " +
              "(ssb / 6.0) / (ssw / cast(n - 7 as double)) end"))
          .withColumn("seasonal",
            when(col("f_stat").isNotNull, col("f_stat") > F95))
          .select(col("g"), col("n").as("n_days"), col("k_eff"),
            col("strength"), col("f_stat"), col("seasonal"))
          .orderBy(col("g"))
      }
    },
    Some {
      val lagAggs = (0 to 6).map { dd =>
        s"""CAST(SUM(CASE WHEN dow = $dd THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_$dd,
               CAST(SUM(CASE WHEN dow = $dd THEN x ELSE 0 END) AS BIGINT)
                 AS s_$dd"""
      }.mkString(",\n               ")
      val termsSql = (0 to 6).map(dd =>
        s"(CASE WHEN n_$dd > 0 THEN CAST(s_$dd * s_$dd AS DOUBLE) " +
          s"/ CAST(n_$dd AS DOUBLE) ELSE 0.0 END)").mkString(" + ")
      val keff = (0 to 6).map(dd =>
        s"(CASE WHEN n_$dd > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"""
      WITH daily AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      dowd AS (SELECT g, day % 7 AS dow, x FROM daily),
      sums AS (
        SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS BIGINT) AS s2,
               $lagAggs
        FROM dowd GROUP BY 1),
      based AS (
        SELECT *, $termsSql AS groups_sum,
               CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS sst,
               $keff AS k_eff
        FROM sums),
      full0 AS (
        SELECT g, n, k_eff, sst,
               groups_sum - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n AS DOUBLE) AS ssb,
               CAST(s2 AS DOUBLE) - groups_sum AS ssw
        FROM based),
      stats AS (
        SELECT g, n AS n_days, CAST(k_eff AS INTEGER) AS k_eff,
               CASE WHEN sst != 0.0 THEN ssb / sst END AS strength,
               CASE WHEN k_eff = 7 AND n > 7 AND ssw != 0.0 THEN
                 (ssb / 6.0) / (ssw / CAST(n - 7 AS DOUBLE)) END
                 AS f_stat
        FROM full0)
      SELECT g, n_days, k_eff, strength, f_stat,
             CASE WHEN f_stat IS NOT NULL THEN f_stat > $F95 END
               AS seasonal
      FROM stats
      ORDER BY g
    """
    })

  val all: Seq[GraftQuery] = Seq(q238)
}
