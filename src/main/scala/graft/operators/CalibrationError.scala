package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X115 — reliability diagram + Expected Calibration Error: the
  * calibration audit (Guo et al., ICML'17 "On Calibration of Modern
  * Neural Networks") a pipeline runs before TRUSTING a model score as
  * a probability — a quality judge whose 0.9 means 60 % keep-worthy
  * documents poisons every threshold downstream, and κ (X108) cannot
  * see it (two miscalibrated judges can agree perfectly). Bins scores
  * into 10 equal-width confidence bins and compares each bin's mean
  * predicted confidence against its EMPIRICAL outcome rate;
  * ECE = Σ_b n_b/n · |acc_b − conf_b|.
  *
  * Score column: a frozen LCG mock per user (the §7.4 frozen-scorer
  * precedent — a real model-score column drops into the same plan);
  * outcome: REAL purchase behavior from the events table. The mock is
  * uncorrelated with outcomes by construction, so the audit SHOWS
  * miscalibration — exactly what it exists to expose; the spec plants
  * a calibrated score and proves ECE → 0.
  *
  * Determinism: scores in integer micro-units from the q30 LCG recipe
  * (REDUCED before multiplied — the r11 overflow lesson), bins by pure
  * integer division, per-bin sums exact longs, acc/conf one shared
  * double tree each, and ECE a FIXED-ORDER 10-term sum over pivoted
  * per-bin columns (the q158 DCG discipline).
  *
  * Scale shape: one events scan → per-user map-side-combined agg →
  * the ≤10-row bin frame; everything after is planning-frame algebra.
  */
object CalibrationError {

  /** The reliability table + ECE over a frame of (purchased ∈ {0,1},
    * mu ∈ [0, 1e6)) rows — one row per scored unit.
    */
  def reliability(users: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val binned = users.withColumn("bin", expr("(mu * 10) div 1000000"))
    val bins = binned.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("purchased")).as("n_pos"),
            sum(col("mu")).as("mu_sum"))
        val tot = bins.agg(sum(col("n_users")).as("n"))
        val per = bins.join(broadcast(tot))
          .withColumn("acc",
            col("n_pos").cast("double") / col("n_users").cast("double"))
          .withColumn("conf",
            col("mu_sum").cast("double") / col("n_users").cast("double")
              / 1000000.0d)
          .withColumn("gap", abs(col("acc") - col("conf")))
          .withColumn("wgap",
            col("n_users").cast("double") * col("gap")
              / col("n").cast("double"))
        // fixed-order ECE: pivot the ≤10 weighted gaps to one row and
        // add them in bin order — identical op order to the oracle
        val gapCols = (0 to 9).map(b =>
          max(when(col("bin") === b, col("wgap"))).as(s"b$b"))
        val ece = per.agg(gapCols.head, gapCols.tail: _*)
          .select((0 to 9).map(b => coalesce(col(s"b$b"), lit(0.0d)))
            .reduce(_ + _).as("ece"))
        per.join(broadcast(ece))
          .select(col("bin"), col("n_users"), col("n_pos"),
            round(col("conf"), 6).as("conf_r"),
            round(col("acc"), 6).as("acc_r"),
            round(col("gap"), 6).as("gap_r"),
            round(col("ece"), 6).as("ece_r"))
          .orderBy(col("bin"))
  }

  /** q160 — calibration of the mock propensity score against observed
    * purchase outcomes, 10 bins + ECE.
    */
  val q160 = GraftQuery(
    "q160_calibration_ece", {
      (s, d) =>
        reliability(t(s, d, "events").groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("purchased"))
          // frozen mock score in micro-units [0, 1e6): reduce BEFORE
          // multiply so the product stays far inside BIGINT at any id
          .withColumn("mu",
            pmod(pmod(col("user_id"), lit(1000000L)) * 1103515245L
              + 12345L, lit(1000000L)))
          .select(col("purchased"), col("mu")))
    },
    Some("""
      WITH users AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS purchased,
               ((user_id % 1000000) * 1103515245 + 12345) % 1000000 AS mu
        FROM events GROUP BY user_id),
      binned AS (
        SELECT user_id, purchased, mu, (mu * 10) // 1000000 AS bin
        FROM users),
      bins AS (
        SELECT bin, COUNT(*) AS n_users,
               CAST(SUM(purchased) AS BIGINT) AS n_pos,
               CAST(SUM(mu) AS BIGINT) AS mu_sum
        FROM binned GROUP BY bin),
      tot AS (SELECT SUM(n_users) AS n FROM bins),
      per AS (
        SELECT b.bin, b.n_users, b.n_pos,
               CAST(b.n_pos AS DOUBLE) / CAST(b.n_users AS DOUBLE) AS acc,
               CAST(b.mu_sum AS DOUBLE) / CAST(b.n_users AS DOUBLE)
                 / 1000000.0 AS conf,
               t.n
        FROM bins b CROSS JOIN tot t),
      gapped AS (
        SELECT bin, n_users, n_pos, acc, conf, abs(acc - conf) AS gap,
               CAST(n_users AS DOUBLE) * abs(acc - conf)
                 / CAST(n AS DOUBLE) AS wgap
        FROM per),
      ece AS (
        SELECT """ + (0 to 9).map(b =>
          s"COALESCE(MAX(CASE WHEN bin = $b THEN wgap END), 0.0)")
          .mkString(" + ") + """ AS ece
        FROM gapped)
      SELECT g.bin, g.n_users, g.n_pos,
             round(g.conf, 6) AS conf_r, round(g.acc, 6) AS acc_r,
             round(g.gap, 6) AS gap_r, round(e.ece, 6) AS ece_r
      FROM gapped g CROSS JOIN ece e
      ORDER BY g.bin
    """))

  val all: Seq[GraftQuery] = Seq(q160)
}
