package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X222 — Theil's uncertainty coefficient (Theil 1970):
  * U(X|Y) = I(X;Y) / H(X) — the ASYMMETRIC categorical association:
  * what fraction of the uncertainty in the event-type mix does
  * knowing the weekday remove? X219's Cramér's V is symmetric and
  * says "entangled"; U says "predictable FROM", which is the
  * direction a feature audit needs (a high U(label|feature) is
  * leakage; a high U(type|weekday) is seasonality a sampler must
  * stratify on). Computed on the q238/X203 weekday axis (epoch-day
  * mod 7 — engine dayofweek() builtins disagree, so neither is used).
  *
  * Determinism: everything reduces to THREE entropy-style sums over
  * integer counts — S_xy = Σ c_xy·ln c_xy over the grid, S_x, S_y
  * over the margins — since
  *   I = ln N + (S_xy − S_x − S_y)/N,  H(X) = ln N − S_x/N.
  * Each term is one fixed double tree over a long (ln of an integer);
  * the cross-cell sums travel as DECIMAL(30,14) (the q162 recipe).
  * Constant X (H(X) = 0) → NULL U.
  *
  * Scale shape: one map-side groupBy to the |types × 7| grid; margins
  * and the three sums run on that dimension frame. Corpus touched
  * once.
  */
object TheilsU {

  /** q255 — U(event_type | weekday), with I and H(X) alongside. */
  val q255 = GraftQuery(
    "q255_theils_u", {
      (s, d) => {
        val grid = t(s, d, "events")
          .select(col("event_type").as("x"),
            pmod(epochDay(col("ts")), lit(7L)).as("y"))
          .groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("c"))
        def entSum(df: org.apache.spark.sql.DataFrame,
            cCol: String, out: String) =
          df.agg(sum((col(cCol).cast("double") *
            log(col(cCol).cast("double"))).cast("decimal(30,14)"))
            .cast("double").as(out))
        val sxy = entSum(grid, "c", "s_xy")
        val sx = entSum(
          grid.groupBy(col("x")).agg(sum(col("c")).as("cx")),
          "cx", "s_x")
        val sy = entSum(
          grid.groupBy(col("y")).agg(sum(col("c")).as("cy")),
          "cy", "s_y")
        val n = grid.agg(sum(col("c")).as("n"))
        n.join(broadcast(sxy)).join(broadcast(sx)).join(broadcast(sy))
          .withColumn("h_x",
            log(col("n").cast("double")) -
              col("s_x") / col("n").cast("double"))
          .withColumn("mi",
            log(col("n").cast("double")) +
              (col("s_xy") - col("s_x") - col("s_y")) /
                col("n").cast("double"))
          .select(col("n"), round(col("h_x"), 6).as("h_x_r"),
            round(col("mi"), 6).as("mutual_info"),
            when(col("h_x") > 0d,
              round(col("mi") / col("h_x"), 6)).as("theils_u"))
      }
    },
    Some("""
      WITH grid AS (
        SELECT event_type AS x,
               (CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                 // 86400) % 7 AS y,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2),
      sxy AS (
        SELECT CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
          AS DECIMAL(30,14))) AS DOUBLE) AS s_xy FROM grid),
      sx AS (
        SELECT CAST(SUM(CAST(CAST(cx AS DOUBLE) * ln(CAST(cx AS DOUBLE))
          AS DECIMAL(30,14))) AS DOUBLE) AS s_x
        FROM (SELECT x, SUM(c) AS cx FROM grid GROUP BY x)),
      sy AS (
        SELECT CAST(SUM(CAST(CAST(cy AS DOUBLE) * ln(CAST(cy AS DOUBLE))
          AS DECIMAL(30,14))) AS DOUBLE) AS s_y
        FROM (SELECT y, SUM(c) AS cy FROM grid GROUP BY y)),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid),
      fin AS (
        SELECT n,
               ln(CAST(n AS DOUBLE)) - s_x / CAST(n AS DOUBLE) AS h_x,
               ln(CAST(n AS DOUBLE))
                 + (s_xy - s_x - s_y) / CAST(n AS DOUBLE) AS mi
        FROM tot CROSS JOIN sxy CROSS JOIN sx CROSS JOIN sy)
      SELECT n, round(h_x, 6) AS h_x_r, round(mi, 6) AS mutual_info,
             CASE WHEN h_x > 0 THEN round(mi / h_x, 6) END AS theils_u
      FROM fin
    """))

  val all: Seq[GraftQuery] = Seq(q255)
}
