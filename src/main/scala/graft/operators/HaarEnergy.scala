package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X198 — Haar multi-resolution energy decomposition of the hourly
  * count series (Haar 1910's orthogonal system; the discrete wavelet
  * variance reading follows Percival & Walden 2000 ch. 8): for each
  * feed and dyadic scale 2/4/8 hours, the detail coefficients
  *   d = Σ_{first half} x − Σ_{second half}
  * over disjoint aligned blocks, and their total energy Σ d² — WHICH
  * TIMESCALE carries a feed's variance. X162's Fano says "bursty",
  * X197's Q says "serially dependent", this says "the bursts live at
  * the 4-hour scale, not the 2-hour one" — the triage number that
  * separates sub-hour retry storms from shift-level load swings.
  *
  * Exactness: coefficients and energies are EXACT LONG arithmetic end
  * to end (sums and squares of hourly counts) — no float anywhere, so
  * the oracle is hash-exact by construction. Blocks are aligned to
  * each feed's observed-hour index (row_number over observed hours —
  * the X162/X197 observed-series convention); the trailing incomplete
  * block at each scale is EXCLUDED (stated: energies compare complete
  * blocks only, so scales are not polluted by ragged tails).
  *
  * Scale shape: one map-side groupBy to the |types × hours| frame,
  * one per-type index window (the shared monitoring-tier exchange),
  * a ×3 scale explode RIDING that dimension frame (never the raw
  * scan), and two map-side groupBys down to |types|·3 rows.
  */
object HaarEnergy {

  /** Dyadic scales audited: (level, block width, half width). */
  val Levels: Seq[(Int, Long, Long)] = Seq((1, 2L, 1L), (2, 4L, 2L),
    (3, 8L, 4L))

  /** q234 — per-type, per-scale Haar detail energy. */
  val q234 = GraftQuery(
    "q234_haar_energy", {
      (s, d) => {
        val w = Window.partitionBy(col("g")).orderBy(col("h"))
        val lv = array(Levels.map { case (l, wd, hf) =>
          struct(lit(l).as("lvl"), lit(wd).as("wd"), lit(hf).as("hf"))
        }: _*)
        t(s, d, "events")
          .groupBy(col("event_type").as("g"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("idx", row_number().over(w).cast("long") - 1L)
          .select(col("g"), col("idx"), col("x"),
            explode(lv).as("c"))
          .select(col("g"), col("c.lvl").as("lvl"), col("c.wd").as("wd"),
            col("c.hf").as("hf"), col("idx"), col("x"))
          .withColumn("blk", expr("idx div wd"))
          .withColumn("signed",
            when(pmod(col("idx"), col("wd")) < col("hf"), col("x"))
              .otherwise(-col("x")))
          .groupBy(col("g"), col("lvl"), col("wd"), col("blk"))
          .agg(sum(col("signed")).as("dcoef"), count(lit(1)).as("cnt"))
          .filter(col("cnt") === col("wd"))
          .groupBy(col("g"), col("lvl"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("dcoef") * col("dcoef")).as("energy"),
            max(abs(col("dcoef"))).as("max_abs_coef"))
          .orderBy(col("g"), col("lvl"))
      }
    },
    Some("""
      WITH hourly AS (
        SELECT event_type AS g, date_trunc('hour', ts) AS h,
               COUNT(*) AS x
        FROM events GROUP BY 1, 2),
      indexed AS (
        SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) - 1 AS idx
        FROM hourly),
      leveled AS (
        SELECT g, idx, x, lv.lvl, lv.wd, lv.hf
        FROM indexed
        CROSS JOIN (VALUES (1, 2, 1), (2, 4, 2), (3, 8, 4))
          AS lv(lvl, wd, hf)),
      coefs AS (
        SELECT g, CAST(lvl AS INTEGER) AS lvl, wd, idx // wd AS blk,
               CAST(SUM(CASE WHEN idx % wd < hf THEN x ELSE -x END)
                 AS BIGINT) AS dcoef,
               COUNT(*) AS cnt
        FROM leveled
        GROUP BY g, lvl, wd, idx // wd)
      SELECT g, lvl, COUNT(*) AS n_blocks,
             CAST(SUM(dcoef * dcoef) AS BIGINT) AS energy,
             CAST(MAX(ABS(dcoef)) AS BIGINT) AS max_abs_coef
      FROM coefs
      WHERE cnt = wd
      GROUP BY g, lvl
      ORDER BY g, lvl
    """))

  val all: Seq[GraftQuery] = Seq(q234)
}
