package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X252 — Bartlett's test of variance homogeneity (Bartlett 1937) of
  * `o_totalprice` across order priorities: the NORMAL-THEORY
  * counterpart to q270's Levene — more powerful when the groups pass
  * q282's Jarque–Bera gate, notoriously fragile when they don't (its
  * χ² is a kurtosis meter under heavy tails, Box 1953), which is
  * exactly why the three ship together: JB triages, Bartlett scores
  * the clean case, Levene the contaminated one.
  *
  * T = [(N−k)·ln S²_p − Σ(nⱼ−1)·ln S²ⱼ] / C with
  * C = 1 + (Σ 1/(nⱼ−1) − 1/(N−k)) / (3(k−1)), T ~ χ²(k−1).
  *
  * Determinism: ONE corpus pass — per-group (n, Σv, Σv²) where Σv is
  * an exact DECIMAL(18,2) aggregate and Σv² a DECIMAL(38,6) lane of
  * per-row v·v doubles (exact: 2-dp prices square to ≤4-dp values
  * under 2⁵³); each group's unbiased S²ⱼ = (n·Σv² − (Σv)²)/(n(n−1))
  * is one double tree, the T/C fold one more over the ≤k-row frame
  * with DECIMAL(30,14) lanes for the ln and reciprocal sums. Groups
  * with n < 2 are excluded (stated — they carry no variance
  * information); any surviving group with S²ⱼ ≤ 0 → NULL T. The
  * critical value is the shared [[ChiSqCrit]] CASE at df = k−1.
  *
  * Scale shape: one map-side-combined aggregate to a ≤k-row frame,
  * then ≤k-row folds. No second pass, no window, no pair face.
  */
object Bartlett {

  /** q283 — Bartlett T of o_totalprice spread across priorities. */
  val q283 = GraftQuery(
    "q283_bartlett_variance", {
      (s, d) => {
        val obs = t(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            col("o_totalprice").cast("double").as("v"))
        val perGrp = obs.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_g"),
            sum(dec(col("v"))).cast("double").as("sv"),
            sum((col("v") * col("v")).cast("decimal(38,6)"))
              .cast("double").as("svv"))
          .filter(col("n_g") >= 2L)
        val nD = col("n_g").cast("double")
        val s2 = (nD * col("svv") - col("sv") * col("sv")) /
          (nD * (nD - 1.0d))
        val critCase = ChiSqCrit.sparkCase("k - 1", "bartlett")
        perGrp
          .withColumn("s2_g", s2)
          .withColumn("ssq", (nD - 1.0d) * s2)
          .withColumn("lnterm",
            when(s2 > 0d, (nD - 1.0d) * log(s2)))
          .withColumn("recip", lit(1.0d) / (nD - 1.0d))
          .groupBy()
          .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
            min(col("s2_g")).as("s2_min"),
            sum(col("ssq").cast("decimal(30,14)")).cast("double")
              .as("ssq_t"),
            sum(col("lnterm").cast("decimal(30,14)")).cast("double")
              .as("ln_t"),
            sum(col("recip").cast("decimal(30,14)")).cast("double")
              .as("recip_t"))
          .withColumn("df2", (col("n") - col("k")).cast("double"))
          .withColumn("t_stat",
            when(col("k") > 1L && col("s2_min") > 0d,
              (col("df2") * log(col("ssq_t") / col("df2")) -
                col("ln_t")) /
                (lit(1.0d) + (col("recip_t") - lit(1.0d) / col("df2")) /
                  (lit(3.0d) * (col("k").cast("double") - 1.0d)))))
          .withColumn("crit",
            when(col("k") > 1L, expr(critCase)))
          .select(col("n"), col("k"),
            round(col("t_stat"), 6).as("t_r"),
            round(col("crit"), 6).as("crit_r"),
            (col("t_stat") > col("crit")).as("heteroscedastic"))
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
                 AS s2
        FROM pergrp),
      folded AS (
        SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
               MIN(s2) AS s2_min,
               CAST(SUM(CAST((CAST(n_g AS DOUBLE) - 1.0) * s2
                 AS DECIMAL(30,14))) AS DOUBLE) AS ssq_t,
               CAST(SUM(CAST(CASE WHEN s2 > 0 THEN
                 (CAST(n_g AS DOUBLE) - 1.0) * ln(s2) END
                 AS DECIMAL(30,14))) AS DOUBLE) AS ln_t,
               CAST(SUM(CAST(1.0 / (CAST(n_g AS DOUBLE) - 1.0)
                 AS DECIMAL(30,14))) AS DOUBLE) AS recip_t
        FROM vars),
      calc AS (
        SELECT k, n, CAST(n - k AS DOUBLE) AS df2, s2_min, ssq_t,
               ln_t, recip_t
        FROM folded)
      SELECT n, k,
             CASE WHEN k > 1 AND s2_min > 0 THEN
               round((df2 * ln(ssq_t / df2) - ln_t)
                 / (1.0 + (recip_t - 1.0 / df2)
                    / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6)
             END AS t_r,
             CASE WHEN k > 1 THEN
               round(${ChiSqCrit.duckCase("k - 1", "bartlett")}, 6)
             END AS crit_r,
             CASE WHEN k > 1 AND s2_min > 0 THEN
               (df2 * ln(ssq_t / df2) - ln_t)
                 / (1.0 + (recip_t - 1.0 / df2)
                    / (3.0 * (CAST(k AS DOUBLE) - 1.0)))
             END > ${ChiSqCrit.duckCase("k - 1", "bartlett")}
               AS heteroscedastic
      FROM calc
    """))

  val all: Seq[GraftQuery] = Seq(q283)
}
