package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X251 — Jarque–Bera normality test (Jarque & Bera 1980) of
  * `o_totalprice` within each order priority: the PRECONDITION gate
  * for the parametric tier — q238's ANOVA, X208's trimmed-mean
  * contrasts and every z-interval on spend silently assume
  * near-normal groups; JB scores the assumption itself from the
  * sample skewness g₁ = m₃/m₂^1.5 and excess kurtosis g₂ = m₄/m₂²−3,
  * JB = n/6·(g₁² + g₂²/4) ~ χ²(2). A group that fails JB is routed to
  * the nonparametric tier (q247/q250/q271) instead — the triage rule
  * a monitoring stack applies before picking its test battery.
  *
  * Determinism: the Levene two-pass recipe — group means are exact
  * DECIMAL(18,2) sums over 2-dp prices divided once; each row's
  * centered powers dx², dx³, dx⁴ are ONE double tree, summed on
  * DECIMAL(38,6) lanes (exact, associative; the 6-dp lane on ~1e20
  * terms keeps 1e-26 relative granularity, identical both engines);
  * g₁/g₂/JB are single double trees over those lane totals; the
  * χ²(0.95, 2) bar is the embedded literal 5.991464547107979. Zero
  * variance → NULL.
  *
  * Scale shape: two corpus passes (means, then centered moments),
  * both map-side-combined to ≤k-row frames; the means frame is
  * eagerly materialized before its broadcast (the q240 discipline).
  * No window, no pair face.
  */
object JarqueBera {

  /** χ²(0.95, 2). */
  private val Crit = 5.991464547107979d

  /** q282 — per-priority normality of order totals. */
  val q282 = GraftQuery(
    "q282_jarque_bera", {
      (s, d) => {
        val obs = t(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            col("o_totalprice").cast("double").as("v"))
        val means = graft.Checkpoints.eager(obs.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_g"),
            (sum(dec(col("v"))).cast("double") / count(lit(1)))
              .as("mean_g")))
        val dx = col("v") - col("mean_g")
        val folded = obs.join(broadcast(means), "grp")
          .withColumn("d2", dx * dx)
          .withColumn("d3", dx * dx * dx)
          .withColumn("d4", dx * dx * dx * dx)
          .groupBy(col("grp"))
          .agg(max(col("n_g")).as("n"),
            sum(col("d2").cast("decimal(38,6)")).cast("double")
              .as("s2"),
            sum(col("d3").cast("decimal(38,6)")).cast("double")
              .as("s3"),
            sum(col("d4").cast("decimal(38,6)")).cast("double")
              .as("s4"))
        val nD = col("n").cast("double")
        val m2 = col("s2") / nD
        val m3 = col("s3") / nD
        val m4 = col("s4") / nD
        folded
          .withColumn("g1",
            when(col("s2") > 0d, m3 / sqrt(m2 * m2 * m2)))
          .withColumn("g2",
            when(col("s2") > 0d, m4 / (m2 * m2) - 3.0d))
          .withColumn("jb",
            nD / 6.0d * (col("g1") * col("g1") +
              col("g2") * col("g2") / 4.0d))
          .select(col("grp"), col("n"),
            round(col("g1"), 6).as("skew_r"),
            round(col("g2"), 6).as("kurt_r"),
            round(col("jb"), 6).as("jb_r"),
            (col("jb") > Crit).as("nonnormal"))
          .orderBy(col("grp"))
      }
    },
    Some(s"""
      WITH obs AS (
        SELECT o_orderpriority AS grp,
               CAST(o_totalprice AS DOUBLE) AS v
        FROM orders),
      means AS (
        SELECT grp, COUNT(*) AS n_g,
               CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS mean_g
        FROM obs GROUP BY grp),
      folded AS (
        SELECT o.grp, MAX(m.n_g) AS n,
               CAST(SUM(CAST((o.v - m.mean_g) * (o.v - m.mean_g)
                 AS DECIMAL(38,6))) AS DOUBLE) AS s2,
               CAST(SUM(CAST((o.v - m.mean_g) * (o.v - m.mean_g)
                 * (o.v - m.mean_g) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
               CAST(SUM(CAST((o.v - m.mean_g) * (o.v - m.mean_g)
                 * (o.v - m.mean_g) * (o.v - m.mean_g)
                 AS DECIMAL(38,6))) AS DOUBLE) AS s4
        FROM obs o JOIN means m ON m.grp = o.grp
        GROUP BY o.grp),
      calc AS (
        SELECT grp, n,
               CASE WHEN s2 > 0 THEN
                 (s3 / CAST(n AS DOUBLE)) / sqrt((s2 / CAST(n AS DOUBLE))
                   * (s2 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)))
               END AS g1,
               CASE WHEN s2 > 0 THEN
                 (s4 / CAST(n AS DOUBLE)) / ((s2 / CAST(n AS DOUBLE))
                   * (s2 / CAST(n AS DOUBLE))) - 3.0
               END AS g2
        FROM folded)
      SELECT grp, CAST(n AS BIGINT) AS n,
             round(g1, 6) AS skew_r,
             round(g2, 6) AS kurt_r,
             round(CAST(n AS DOUBLE) / 6.0
               * (g1 * g1 + g2 * g2 / 4.0), 6) AS jb_r,
             CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
               > $Crit AS nonnormal
      FROM calc
      ORDER BY grp
    """))

  val all: Seq[GraftQuery] = Seq(q282)
}
