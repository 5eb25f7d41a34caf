package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X228 — Cochran–Armitage trend test (Cochran 1954; Armitage 1955):
  * does a BINARY rate move monotonically across ORDERED groups? The
  * ordered-alternative companion to X219's Cramér's V (which treats
  * the grouping as nominal and burns power on non-monotone patterns):
  * here the groups carry scores w = 1..k and the statistic is the
  * score-weighted deviation of per-group success counts — the
  * standard dose-response / severity-gradient read ("does fulfillment
  * rate fall as order priority relaxes?").
  *
  * Formulation: groups = the five order priorities in their literal
  * order (score = the priority string's leading digit — exact); the
  * outcome is o_orderstatus = 'F' (fulfilled). Z's numerator
  * U = N·Σw·r − R·Σw·n and the variance kernel N·Σw²n − (Σw·n)² are
  * exact longs; Z = U / sqrt(R(N−R)·kernel / N) is ONE double tree
  * (the three-way product is taken in doubles — long×long×long at
  * corpus scale would overflow Spark's ANSI int64 while DuckDB
  * promotes to HUGEINT, the divergence this tier never touches).
  * Degenerate variance (no successes, no failures, or one group) →
  * NULL.
  *
  * Scale shape: one scan → one ≤k-row groupBy → a 1-row fold.
  */
object CochranArmitage {

  /** χ²(0.95, 1) on Z². */
  private val Crit = 3.841458820694124

  /** q260 — fulfillment-rate trend across order priorities. */
  val q260 = GraftQuery(
    "q260_cochran_armitage", {
      (s, d) => {
        val byGrp = t(s, d, "orders")
          .select(substring(col("o_orderpriority"), 1, 1).cast("long")
            .as("w"),
            when(col("o_orderstatus") === "F", 1L).otherwise(0L)
              .as("y"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("n_g"), sum(col("y")).as("r_g"))
        byGrp.agg(
            sum(col("n_g")).as("n"), sum(col("r_g")).as("r"),
            sum(col("w") * col("r_g")).as("swr"),
            sum(col("w") * col("n_g")).as("swn"),
            sum(col("w") * col("w") * col("n_g")).as("sw2n"),
            count(lit(1)).as("k"))
          .withColumn("u",
            col("n").cast("double") * col("swr").cast("double") -
              col("r").cast("double") * col("swn").cast("double"))
          .withColumn("kern",
            col("n").cast("double") * col("sw2n").cast("double") -
              col("swn").cast("double") * col("swn").cast("double"))
          .withColumn("varz",
            col("r").cast("double") * (col("n") - col("r")).cast("double")
              * col("kern") / col("n").cast("double"))
          .select(col("n"), col("r"), col("k"),
            when(col("varz") > 0d,
              round(col("u") / sqrt(col("varz")), 6)).as("z_r"),
            (when(col("varz") > 0d,
              round(col("u") / sqrt(col("varz")), 6)) *
              when(col("varz") > 0d,
                round(col("u") / sqrt(col("varz")), 6)) > Crit)
              .as("significant"))
      }
    },
    Some(s"""
      WITH bygrp AS (
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
               COUNT(*) AS n_g,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                 END) AS BIGINT) AS r_g
        FROM orders GROUP BY 1),
      folded AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(r_g) AS BIGINT) AS r,
               CAST(SUM(w * r_g) AS BIGINT) AS swr,
               CAST(SUM(w * n_g) AS BIGINT) AS swn,
               CAST(SUM(w * w * n_g) AS BIGINT) AS sw2n,
               COUNT(*) AS k
        FROM bygrp),
      stats AS (
        SELECT n, r, k,
               CAST(n AS DOUBLE) * CAST(swr AS DOUBLE)
                 - CAST(r AS DOUBLE) * CAST(swn AS DOUBLE) AS u,
               CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)
                 * (CAST(n AS DOUBLE) * CAST(sw2n AS DOUBLE)
                    - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE))
                 / CAST(n AS DOUBLE) AS varz
        FROM folded)
      SELECT n, r, k,
             CASE WHEN varz > 0 THEN round(u / sqrt(varz), 6) END AS z_r,
             (CASE WHEN varz > 0 THEN round(u / sqrt(varz), 6) END)
               * (CASE WHEN varz > 0 THEN round(u / sqrt(varz), 6) END)
               > $Crit AS significant
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q260)
}
