package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X213 — Kendall τ-b rank correlation between event-type daily-volume
  * series (Kendall 1938; the τ-b tie correction per Kendall 1945):
  * for every unordered PAIR of event types, the concordant/discordant
  * day-pair census of their daily counts and
  *   τ-b = (C − D) / √((n₀ − n₁)(n₀ − n₂))
  * with n₀ = day pairs, n₁/n₂ = pairs tied in x/y. "Do error volumes
  * move WITH purchase volumes" is the cross-series co-movement
  * question X202's Mann–Kendall (one series vs time — in fact MK's S
  * IS Kendall's numerator against time) and X194's Spearman
  * (value-rank ρ over paired rows) don't answer for the volume
  * dashboard; distribution-free where q150's Pearson matrix assumes
  * linearity.
  *
  * Determinism: C, D, n₀, n₁, n₂ are exact longs from strict
  * comparisons on integer counts; τ-b is one fixed double tree over
  * them (single IEEE sqrt). A pair with either series fully tied
  * (n₀ = n₁ or n₀ = n₂) → guarded NULL τ.
  *
  * Scale shape: one map-side groupBy to the |types × days| frame;
  * the day-align join and the day-pair face run on THAT dimension
  * frame (days grow with wall time, not volume — the X202 economics).
  * The corpus is touched once.
  */
object KendallTau {

  /** q246 — τ-b over all event-type pairs' daily counts. */
  val q246 = GraftQuery(
    "q246_kendall_tau", {
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            epochDay(col("ts")).as("day"))
          .agg(count(lit(1)).as("x"))
        val paired = daily.as("a")
          .join(daily.as("b"),
            col("a.day") === col("b.day") && col("a.g") < col("b.g"))
          .select(col("a.g").as("ga"), col("b.g").as("gb"),
            col("a.day").as("day"), col("a.x").as("xa"),
            col("b.x").as("xb"))
        val face = paired.as("p")
          .join(paired.as("q"),
            col("p.ga") === col("q.ga") && col("p.gb") === col("q.gb") &&
              col("p.day") < col("q.day"))
          .groupBy(col("p.ga").as("ga"), col("p.gb").as("gb"))
          .agg(
            count(lit(1)).as("n0"),
            sum(when((col("q.xa") > col("p.xa") &&
              col("q.xb") > col("p.xb")) ||
              (col("q.xa") < col("p.xa") && col("q.xb") < col("p.xb")),
              1L).otherwise(0L)).as("conc"),
            sum(when((col("q.xa") > col("p.xa") &&
              col("q.xb") < col("p.xb")) ||
              (col("q.xa") < col("p.xa") && col("q.xb") > col("p.xb")),
              1L).otherwise(0L)).as("disc"),
            sum(when(col("q.xa") === col("p.xa"), 1L).otherwise(0L))
              .as("ties_x"),
            sum(when(col("q.xb") === col("p.xb"), 1L).otherwise(0L))
              .as("ties_y"))
        face
          .withColumn("tau_b",
            when(col("n0") > col("ties_x") && col("n0") > col("ties_y"),
              round((col("conc") - col("disc")).cast("double") /
                sqrt((col("n0") - col("ties_x")).cast("double") *
                  (col("n0") - col("ties_y")).cast("double")), 6)))
          .select(col("ga").as("type_a"), col("gb").as("type_b"),
            col("n0"), col("conc"), col("disc"),
            col("ties_x"), col("ties_y"), col("tau_b"))
          .orderBy(col("type_a"), col("type_b"))
      }
    },
    Some("""
      WITH daily AS (
        SELECT event_type AS g,
               CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
                 AS day,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      paired AS (
        SELECT a.g AS ga, b.g AS gb, a.day AS day, a.x AS xa, b.x AS xb
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.g < b.g),
      face AS (
        SELECT p.ga, p.gb,
               COUNT(*) AS n0,
               CAST(SUM(CASE WHEN (q.xa > p.xa AND q.xb > p.xb)
                 OR (q.xa < p.xa AND q.xb < p.xb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(SUM(CASE WHEN (q.xa > p.xa AND q.xb < p.xb)
                 OR (q.xa < p.xa AND q.xb > p.xb)
                 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
               CAST(SUM(CASE WHEN q.xa = p.xa THEN 1 ELSE 0 END)
                 AS BIGINT) AS ties_x,
               CAST(SUM(CASE WHEN q.xb = p.xb THEN 1 ELSE 0 END)
                 AS BIGINT) AS ties_y
        FROM paired p JOIN paired q
          ON p.ga = q.ga AND p.gb = q.gb AND p.day < q.day
        GROUP BY 1, 2)
      SELECT ga AS type_a, gb AS type_b, n0, conc, disc, ties_x, ties_y,
             CASE WHEN n0 > ties_x AND n0 > ties_y THEN
               round(CAST(conc - disc AS DOUBLE) /
                 sqrt(CAST(n0 - ties_x AS DOUBLE)
                   * CAST(n0 - ties_y AS DOUBLE)), 6) END AS tau_b
      FROM face
      ORDER BY type_a, type_b
    """))

  val all: Seq[GraftQuery] = Seq(q246)
}
