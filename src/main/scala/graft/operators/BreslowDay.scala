package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X253 — Breslow–Day homogeneity of odds ratios (Breslow & Day 1980,
  * §IV.4) with Tarone's correction (Tarone 1985) over the SAME
  * monthly 2×2 strata q261 pools: the prerequisite check the
  * Mantel–Haenszel estimate quietly assumes — MH pools per-stratum
  * odds ratios into ONE number, which is only an honest summary if
  * the strata share a common ratio; BD tests exactly that, so a
  * dashboard reads q284 BEFORE trusting q261 (heterogeneous strata →
  * report per-month ratios, don't pool).
  *
  * Per stratum, the expected exposed-case count Ê under the common
  * OR ψ̂ = ψ_MH solves the quadratic
  * (1−ψ)Ê² + (N−r−c+ψ(r+c))Ê − ψrc = 0 (r, c = exposed/case
  * margins), taking the root inside [max(0, r+c−N), min(r, c)]
  * (ψ = 1 degenerates to the linear rc/N); the fitted variance is
  * V = 1/(1/Ê + 1/(r−Ê) + 1/(c−Ê) + 1/(N−r−c+Ê)); T = Σ(a−Ê)²/V,
  * Tarone subtracts (Σ(a−Ê))²/ΣV; T ~ χ²(k−1).
  *
  * Determinism: cells/margins are exact longs from the SHARED
  * [[MantelHaenszel.cells]] census (one tree with q261, so the pair
  * cannot drift); ψ̂ is the 1-row sr/sss fold joined back by
  * broadcast; each stratum's Ê/V/terms are ONE double tree over
  * those longs (root choice is an integer-free CASE on the bound
  * check, identical both engines; disc is clamped at 0 with
  * greatest()); per-stratum terms cross the fold as DECIMAL(30,14)
  * lanes. Degenerate strata (an empty margin row/column — zero
  * information about the ratio) are excluded, stated; ψ̂ NULL or < 2
  * informative strata → NULL T. The critical value is the shared
  * [[ChiSqCrit]] table through df 12 and the Wilson–Hilferty closed
  * form past it (months are data-dependent — a loud error at df 13
  * would make wall-time itself the failure).
  *
  * Scale shape: one scan → the |months|-row census (wall-time
  * bounded) → a 1-row ψ̂ fold broadcast back → a 1-row decimal fold.
  */
object BreslowDay {

  /** q284 — BD/Tarone homogeneity of the monthly (value→fulfilled)
    * odds ratios.
    */
  val q284 = GraftQuery(
    "q284_breslow_day", {
      (s, d) => {
        // |months|-row census, eager: the ψ̂ fold and the BD fold both
        // consume it (the q240 recompute discipline)
        val cells = graft.Checkpoints.eager(
          MantelHaenszel.cells(t(s, d, "orders"))
            .withColumn("nn",
              col("a") + col("b") + col("cc") + col("dd"))
            .withColumn("r", col("a") + col("b"))
            .withColumn("c", col("a") + col("cc"))
            .filter(col("r") > 0L && col("c") > 0L &&
              col("r") < col("nn") && col("c") < col("nn")))
        val psi = cells
          .withColumn("rt",
            col("a").cast("double") * col("dd").cast("double") /
              col("nn").cast("double"))
          .withColumn("st",
            col("b").cast("double") * col("cc").cast("double") /
              col("nn").cast("double"))
          .agg(sum(col("rt").cast("decimal(30,14)")).cast("double")
            .as("sr"),
            sum(col("st").cast("decimal(30,14)")).cast("double")
              .as("sss"))
          .select(when(col("sr") > 0d && col("sss") > 0d,
            col("sr") / col("sss")).as("psi"))
        val rD = col("r").cast("double")
        val cD = col("c").cast("double")
        val nD = col("nn").cast("double")
        val aQ = lit(1.0d) - col("psi")
        val bQ = nD - rD - cD + col("psi") * (rD + cD)
        val cQ = -col("psi") * rD * cD
        val disc = greatest(bQ * bQ - lit(4.0d) * aQ * cQ, lit(0.0d))
        val e1 = (-bQ + sqrt(disc)) / (lit(2.0d) * aQ)
        val e2 = (-bQ - sqrt(disc)) / (lit(2.0d) * aQ)
        val lo = greatest(lit(0.0d), rD + cD - nD)
        val hi = least(rD, cD)
        val eHat = when(abs(aQ) < 1e-12, rD * cD / nD)
          .otherwise(when(e1 >= lo && e1 <= hi, e1).otherwise(e2))
        val vInv = lit(1.0d) / eHat + lit(1.0d) / (rD - eHat) +
          lit(1.0d) / (cD - eHat) +
          lit(1.0d) / (nD - rD - cD + eHat)
        val dev = col("a").cast("double") - eHat
        val critCase = ChiSqCrit.sparkCaseWh("k - 1")
        cells.join(broadcast(psi))
          .filter(col("psi").isNotNull)
          .withColumn("t_term", dev * dev * vInv)
          .withColumn("dev", dev)
          .withColumn("v", lit(1.0d) / vInv)
          .groupBy()
          .agg(count(lit(1)).as("k"),
            sum(col("t_term").cast("decimal(30,14)")).cast("double")
              .as("t_bd"),
            sum(col("dev").cast("decimal(30,14)")).cast("double")
              .as("sdev"),
            sum(col("v").cast("decimal(30,14)")).cast("double")
              .as("sv"))
          .withColumn("t_tarone",
            when(col("k") > 1L && col("sv") > 0d,
              col("t_bd") - col("sdev") * col("sdev") / col("sv")))
          .withColumn("crit", when(col("k") > 1L, expr(critCase)))
          .select(col("k").as("n_strata"),
            round(col("t_bd"), 6).as("t_bd_r"),
            round(col("t_tarone"), 6).as("t_tarone_r"),
            round(col("crit"), 6).as("crit_r"),
            (col("t_tarone") > col("crit")).as("heterogeneous"))
      }
    },
    Some(s"""
      WITH strata AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CASE WHEN o_totalprice >= 150000 AND
                 o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN o_totalprice >= 150000 AND
                 o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN o_totalprice < 150000 AND
                 o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cc,
               CAST(SUM(CASE WHEN o_totalprice < 150000 AND
                 o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS dd,
               COUNT(*) AS nn
        FROM orders GROUP BY 1),
      informative AS (
        SELECT *, a + b AS r, a + cc AS c FROM strata
        WHERE a + b > 0 AND a + cc > 0 AND a + b < nn AND a + cc < nn),
      psi AS (
        SELECT CASE WHEN sr > 0 AND sss > 0 THEN sr / sss END AS psi
        FROM (
          SELECT CAST(SUM(CAST(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS DECIMAL(30,14))) AS DOUBLE)
                   AS sr,
                 CAST(SUM(CAST(CAST(b AS DOUBLE) * CAST(cc AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS DECIMAL(30,14))) AS DOUBLE)
                   AS sss
          FROM informative) f),
      fitted AS (
        SELECT i.a, p.psi,
               CAST(i.r AS DOUBLE) AS rd, CAST(i.c AS DOUBLE) AS cd,
               CAST(i.nn AS DOUBLE) AS nd,
               1.0 - p.psi AS aq,
               CAST(i.nn AS DOUBLE) - CAST(i.r AS DOUBLE)
                 - CAST(i.c AS DOUBLE)
                 + p.psi * (CAST(i.r AS DOUBLE) + CAST(i.c AS DOUBLE))
                 AS bq,
               -p.psi * CAST(i.r AS DOUBLE) * CAST(i.c AS DOUBLE) AS cq
        FROM informative i CROSS JOIN psi p
        WHERE p.psi IS NOT NULL),
      roots AS (
        SELECT a, rd, cd, nd,
               CASE WHEN ABS(aq) < 1e-12 THEN rd * cd / nd
                 ELSE CASE WHEN
                   (-bq + sqrt(greatest(bq * bq - 4.0 * aq * cq, 0.0)))
                     / (2.0 * aq) >= greatest(0.0, rd + cd - nd)
                   AND
                   (-bq + sqrt(greatest(bq * bq - 4.0 * aq * cq, 0.0)))
                     / (2.0 * aq) <= least(rd, cd)
                 THEN
                   (-bq + sqrt(greatest(bq * bq - 4.0 * aq * cq, 0.0)))
                     / (2.0 * aq)
                 ELSE
                   (-bq - sqrt(greatest(bq * bq - 4.0 * aq * cq, 0.0)))
                     / (2.0 * aq)
                 END END AS ehat
        FROM fitted),
      terms AS (
        SELECT a, ehat,
               1.0 / ehat + 1.0 / (rd - ehat) + 1.0 / (cd - ehat)
                 + 1.0 / (nd - rd - cd + ehat) AS vinv
        FROM roots),
      folded AS (
        SELECT COUNT(*) AS k,
               CAST(SUM(CAST((CAST(a AS DOUBLE) - ehat)
                 * (CAST(a AS DOUBLE) - ehat) * vinv
                 AS DECIMAL(30,14))) AS DOUBLE) AS t_bd,
               CAST(SUM(CAST(CAST(a AS DOUBLE) - ehat
                 AS DECIMAL(30,14))) AS DOUBLE) AS sdev,
               CAST(SUM(CAST(1.0 / vinv AS DECIMAL(30,14)))
                 AS DOUBLE) AS sv
        FROM terms),
      calc AS (
        SELECT k, t_bd,
               CASE WHEN k > 1 AND sv > 0 THEN
                 t_bd - sdev * sdev / sv END AS t_tarone,
               CASE WHEN k > 1 THEN
                 ${ChiSqCrit.duckCaseWh("k - 1")} END AS crit
        FROM folded)
      SELECT k AS n_strata,
             round(t_bd, 6) AS t_bd_r,
             round(t_tarone, 6) AS t_tarone_r,
             round(crit, 6) AS crit_r,
             t_tarone > crit AS heterogeneous
      FROM calc
    """))

  val all: Seq[GraftQuery] = Seq(q284)
}
