package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X239 — Levene's test of variance homogeneity (Levene 1960, the
  * mean-centered original) of `o_totalprice` across the five order
  * priorities: the SPREAD companion to the location tier — q238's
  * ANOVA and q247's Kruskal–Wallis ask "do the groups' centers
  * differ"; Levene asks "do their DISPERSIONS differ", the
  * homoscedasticity precondition those location tests quietly assume
  * and the question a mix-shift audit actually cares about (a segment
  * whose spend mean is flat but whose variance doubled is a different
  * population). The statistic is a one-way ANOVA F on the absolute
  * deviations z_ij = |y_ij − ȳ_j|.
  *
  * Determinism: group means are exact DECIMAL(18,2) sums over raw
  * 2-dp prices divided once; each z is one double tree; all cross-row
  * sums of computed doubles (z, z²) ride DECIMAL(30,14) lanes (the
  * q162 recipe — exact, associative, engine-agnostic), the five
  * per-group SSB terms likewise; F is one final double tree. The
  * critical value is the large-N asymptote F(0.95, k−1, ∞) =
  * χ²(0.95, k−1)/(k−1) from the shared [[ChiSqCrit]] table (df₂ is
  * ~N at any SF, where the F quantile has converged to 4 decimals) —
  * documented, not interpolated.
  *
  * Scale shape: two corpus passes (means, then centered moments),
  * both map-side-combined aggs to a ≤|groups|-row frame; the means
  * frame joins back via broadcast. Nothing window-shaped, no pair
  * face.
  */
object Levene {

  /** q270 — Levene F of o_totalprice spread across order priorities. */
  val q270 = GraftQuery(
    "q270_levene_variance", {
      (s, d) => {
        val obs = t(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            col("o_totalprice").cast("double").as("v"))
        // eager ≤k-row means frame: its broadcast side would otherwise
        // re-execute the first corpus pass (the q240 discipline)
        val means = graft.Checkpoints.eager(obs.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_g"),
            (sum(dec(col("v"))).cast("double") / count(lit(1)))
              .as("mean_g")))
        val z = obs.join(broadcast(means), "grp")
          .withColumn("z", abs(col("v") - col("mean_g")))
        val perGrp = z.groupBy(col("grp"))
          .agg(max(col("n_g")).as("n_g"),
            sum(col("z").cast("decimal(30,14)")).as("sz"),
            sum((col("z") * col("z")).cast("decimal(30,14)"))
              .as("sz2"))
        val totals = perGrp
          .agg(sum(col("n_g")).as("n"), sum(col("sz")).as("szt"))
          .withColumn("zbar", col("szt").cast("double") /
            col("n").cast("double"))
        val critCase = ChiSqCrit.sparkCase("k - 1", "levene")
        perGrp.join(broadcast(totals))
          .withColumn("zbar_g",
            col("sz").cast("double") / col("n_g").cast("double"))
          .withColumn("ssb_term",
            col("n_g").cast("double") * (col("zbar_g") - col("zbar")) *
              (col("zbar_g") - col("zbar")))
          .withColumn("ssw_term",
            col("sz2").cast("double") - col("n_g").cast("double") *
              col("zbar_g") * col("zbar_g"))
          .groupBy()
          .agg(count(lit(1)).as("k"), max(col("n")).as("n"),
            sum(col("ssb_term").cast("decimal(30,14)")).cast("double")
              .as("ssb"),
            sum(col("ssw_term").cast("decimal(30,14)")).cast("double")
              .as("ssw"))
          .withColumn("f",
            when(col("k") > 1L && col("n") > col("k") &&
              col("ssw") > 0d,
              (col("ssb") / (col("k").cast("double") - 1.0d)) /
                (col("ssw") / (col("n").cast("double") -
                  col("k").cast("double")))))
          .withColumn("crit",
            expr(critCase) / (col("k").cast("double") - 1.0d))
          .select(col("n"), col("k"), round(col("f"), 6).as("f_r"),
            round(col("crit"), 6).as("crit_r"),
            (col("f") > col("crit")).as("heteroscedastic"))
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
      z AS (
        SELECT o.grp, ABS(o.v - m.mean_g) AS z
        FROM obs o JOIN means m ON m.grp = o.grp),
      pergrp AS (
        SELECT g.grp, MAX(m.n_g) AS n_g,
               SUM(CAST(z AS DECIMAL(30,14))) AS sz,
               SUM(CAST(z * z AS DECIMAL(30,14))) AS sz2
        FROM z g JOIN means m ON m.grp = g.grp
        GROUP BY g.grp),
      totals AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sz) AS DOUBLE)
                 / CAST(SUM(n_g) AS DOUBLE) AS zbar
        FROM pergrp),
      terms AS (
        SELECT p.n_g, p.sz2, t.n, t.zbar,
               CAST(p.sz AS DOUBLE) / CAST(p.n_g AS DOUBLE) AS zbar_g
        FROM pergrp p CROSS JOIN totals t),
      folded AS (
        SELECT COUNT(*) AS k, MAX(n) AS n,
               CAST(SUM(CAST(CAST(n_g AS DOUBLE)
                 * (zbar_g - zbar) * (zbar_g - zbar)
                 AS DECIMAL(30,14))) AS DOUBLE) AS ssb,
               CAST(SUM(CAST(CAST(sz2 AS DOUBLE)
                 - CAST(n_g AS DOUBLE) * zbar_g * zbar_g
                 AS DECIMAL(30,14))) AS DOUBLE) AS ssw
        FROM terms)
      SELECT CAST(n AS BIGINT) AS n, k,
             CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
               round((ssb / (CAST(k AS DOUBLE) - 1.0))
                 / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
             END AS f_r,
             round(${ChiSqCrit.duckCase("k - 1", "levene")}
               / (CAST(k AS DOUBLE) - 1.0), 6) AS crit_r,
             CASE WHEN k > 1 AND n > k AND ssw > 0 THEN
               (ssb / (CAST(k AS DOUBLE) - 1.0))
                 / (ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
             END > ${ChiSqCrit.duckCase("k - 1", "levene")}
               / (CAST(k AS DOUBLE) - 1.0) AS heteroscedastic
      FROM folded
    """))

  val all: Seq[GraftQuery] = Seq(q270)
}
