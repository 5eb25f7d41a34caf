package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X260 — Welch's heteroscedastic one-way ANOVA (Welch 1951) of
  * `o_totalprice` across order priorities: the location test that
  * stays valid when q270/q283 REJECT variance homogeneity — classical
  * ANOVA (q238's F) pools a within-variance that doesn't exist under
  * heteroscedasticity, inflating α exactly when the spread battery
  * fires. Welch weights each group by wⱼ = nⱼ/S²ⱼ:
  * F* = [Σwⱼ(x̄ⱼ−x̄w)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ],
  * Λ = Σ(1−wⱼ/Σw)²/(nⱼ−1) — the parametric analogue of q290's
  * Brunner–Munzel (the battery rule: spreads differ → parametric
  * consumers read q291, rank consumers read q290).
  *
  * Determinism: one corpus pass to per-group (n, Σv exact
  * DECIMAL(18,2), Σv² DECIMAL(38,6) lanes — the q283 recipe); the
  * ≤k-row group frame is eagerly materialized (its 1-row Σw/Σwx̄ fold
  * is broadcast back — two consumers, the q240 discipline); every
  * statistic is a single double tree with DECIMAL(30,14) fold lanes.
  * Groups with n < 2 are excluded (no variance information, stated);
  * any surviving zero variance → NULL (wⱼ undefined). The verdict is
  * pinned to F(k−1, ∞) = χ²(k−1)/(k−1) from the shared [[ChiSqCrit]]
  * table — the true Welch denominator df is Satterthwaite-huge at any
  * SF here (≫100), where the F quantile has converged (the
  * q238/q270 convention, stated).
  *
  * Scale shape: one map-side-combined pass → eager ≤k-row frame →
  * 1-row broadcast → ≤k-row fold. No window, no pair face.
  */
object WelchAnova {

  /** q291 — Welch F* of order totals across priorities. */
  val q291 = GraftQuery(
    "q291_welch_anova", {
      (s, d) => {
        val obs = t(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            col("o_totalprice").cast("double").as("v"))
        val nD = col("n_g").cast("double")
        val s2 = (nD * col("svv") - col("sv") * col("sv")) /
          (nD * (nD - 1.0d))
        val perGrp = graft.Checkpoints.eager(obs.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_g"),
            sum(dec(col("v"))).cast("double").as("sv"),
            sum((col("v") * col("v")).cast("decimal(38,6)"))
              .cast("double").as("svv"))
          .filter(col("n_g") >= 2L)
          .withColumn("s2_g", s2)
          .withColumn("w",
            when(s2 > 0d, nD / s2))
          .withColumn("xbar", col("sv") / nD))
        def dlane(x: org.apache.spark.sql.Column) =
          sum(x.cast("decimal(30,14)")).cast("double")
        val wTot = perGrp.agg(count(lit(1)).as("k"),
          min(col("s2_g")).as("s2_min"),
          dlane(col("w")).as("sw"),
          dlane(col("w") * col("xbar")).as("swx"))
        val critCase = ChiSqCrit.sparkCase("k - 1", "welch_anova")
        perGrp.join(broadcast(wTot))
          .withColumn("xw", col("swx") / col("sw"))
          .withColumn("num_term",
            col("w") * (col("xbar") - col("xw")) *
              (col("xbar") - col("xw")))
          .withColumn("lam_term",
            (lit(1.0d) - col("w") / col("sw")) *
              (lit(1.0d) - col("w") / col("sw")) /
              (col("n_g").cast("double") - 1.0d))
          .groupBy()
          .agg(max(col("k")).as("k"), sum(col("n_g")).as("n"),
            max(col("s2_min")).as("s2_min"),
            dlane(col("num_term")).as("num"),
            dlane(col("lam_term")).as("lam"))
          .withColumn("kD", col("k").cast("double"))
          .withColumn("f_star",
            when(col("k") > 1L && col("s2_min") > 0d,
              (col("num") / (col("kD") - 1.0d)) /
                (lit(1.0d) + lit(2.0d) * (col("kD") - 2.0d) /
                  (col("kD") * col("kD") - 1.0d) * col("lam"))))
          .withColumn("crit",
            when(col("k") > 1L,
              expr(critCase) / (col("kD") - 1.0d)))
          .select(col("n"), col("k"),
            round(col("f_star"), 6).as("f_r"),
            round(col("crit"), 6).as("crit_r"),
            (col("f_star") > col("crit")).as("significant"))
      }
    },
    Some(s"""
      WITH obs AS (
        SELECT o_orderpriority AS grp,
               CAST(o_totalprice AS DOUBLE) AS v
        FROM orders),
      pergrp AS (
        SELECT grp, COUNT(*) AS n_g,
               CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS sv,
               CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS svv
        FROM obs GROUP BY grp
        HAVING COUNT(*) >= 2),
      vars AS (
        SELECT grp, n_g,
               (CAST(n_g AS DOUBLE) * svv - sv * sv)
                 / (CAST(n_g AS DOUBLE) * (CAST(n_g AS DOUBLE) - 1.0))
                 AS s2_g,
               CASE WHEN (CAST(n_g AS DOUBLE) * svv - sv * sv)
                 / (CAST(n_g AS DOUBLE) * (CAST(n_g AS DOUBLE) - 1.0))
                 > 0 THEN
                 CAST(n_g AS DOUBLE)
                   / ((CAST(n_g AS DOUBLE) * svv - sv * sv)
                     / (CAST(n_g AS DOUBLE)
                        * (CAST(n_g AS DOUBLE) - 1.0)))
               END AS w,
               sv / CAST(n_g AS DOUBLE) AS xbar
        FROM pergrp),
      wtot AS (
        SELECT COUNT(*) AS k, MIN(s2_g) AS s2_min,
               CAST(SUM(CAST(w AS DECIMAL(30,14))) AS DOUBLE) AS sw,
               CAST(SUM(CAST(w * xbar AS DECIMAL(30,14))) AS DOUBLE)
                 AS swx
        FROM vars),
      folded AS (
        SELECT MAX(t.k) AS k, CAST(SUM(v.n_g) AS BIGINT) AS n,
               MAX(t.s2_min) AS s2_min,
               CAST(SUM(CAST(v.w * (v.xbar - t.swx / t.sw)
                 * (v.xbar - t.swx / t.sw) AS DECIMAL(30,14)))
                 AS DOUBLE) AS num,
               CAST(SUM(CAST((1.0 - v.w / t.sw) * (1.0 - v.w / t.sw)
                 / (CAST(v.n_g AS DOUBLE) - 1.0) AS DECIMAL(30,14)))
                 AS DOUBLE) AS lam
        FROM vars v CROSS JOIN wtot t)
      SELECT n, k,
             CASE WHEN k > 1 AND s2_min > 0 THEN
               round((num / (CAST(k AS DOUBLE) - 1.0))
                 / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                    / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                    * lam), 6)
             END AS f_r,
             CASE WHEN k > 1 THEN
               round(${ChiSqCrit.duckCase("k - 1", "welch_anova")}
                 / (CAST(k AS DOUBLE) - 1.0), 6)
             END AS crit_r,
             CASE WHEN k > 1 AND s2_min > 0 THEN
               (num / (CAST(k AS DOUBLE) - 1.0))
                 / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)
                    / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
                    * lam)
             END > ${ChiSqCrit.duckCase("k - 1", "welch_anova")}
               / (CAST(k AS DOUBLE) - 1.0) AS significant
      FROM folded
    """))

  val all: Seq[GraftQuery] = Seq(q291)
}
