package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X245 — Dunning log-likelihood keyness (Dunning 1993, the G²
  * statistic; "keyness" per Rayson & Garside 2000): which tokens are
  * SIGNIFICANTLY over-represented in each source versus the rest of
  * the corpus? Raw frequency ratios explode on rare words and χ²
  * over-fires on them (Dunning's original point); G² — the
  * likelihood-ratio test on the 2×2 (token, source) contingency
  * table — is the corpus-linguistics standard for "what is this
  * source ABOUT", the per-source signature a mixture-planning
  * dashboard (q109/q151's domain-mix tier) reads before re-weighting.
  *
  * G² = 2·Σ_cell O·ln(O/E), cells (a,b,c,d) = token-in-source,
  * token-elsewhere, other-in-source, other-elsewhere; E from margins.
  *
  * Determinism: all four cells and margins are exact longs from one
  * token census; each row's G² is ONE fixed double tree over those
  * longs (zero cells contribute exactly 0 via lazy CASE, the
  * 0·ln 0 = 0 convention); the over-representation filter is the
  * INTEGER cross-product compare a·N > tokens_s·c_w (no division);
  * the significance bar is the embedded χ²(0.999, 1) literal — 0.999
  * because keyness runs one test per (source, token) and the
  * Bonferroni-minded convention (Rayson) is a strict per-cell bar.
  *
  * Scale shape: one corpus tokenize → a (source, token) census →
  * token margins by a map-side re-agg of that census (never a second
  * corpus pass) → broadcast of the ≤|sources|-row totals. The
  * candidate set is bounded by the MinCount floor (Zipf: tokens with
  * ≥ 20 occurrences are a vanishing fraction of vocab), so output
  * and the margin join stay census-sized. No window, no pair face.
  */
object DunningKeyness {

  /** χ²(0.999, 1) = z(0.9995)². */
  private val Crit = 10.827566170662935d

  /** Global-count floor for candidate tokens. */
  private val MinCount = 20L

  /** q277 — significantly over-represented tokens per source. */
  val q277 = GraftQuery(
    "q277_dunning_keyness", {
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("source"),
            explode(split(normalize(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
        // the census is materialized eagerly so the margin re-aggs and
        // the probe join NEVER re-run the corpus tokenize (the q240
        // discipline — without it the explode subtree executes twice)
        val bySrcTok = graft.Checkpoints.eager(
          toks.groupBy(col("source"), col("w"))
            .agg(count(lit(1)).as("a")))
        val byTok = bySrcTok.groupBy(col("w"))
          .agg(sum(col("a")).as("cw"))
          .filter(col("cw") >= MinCount)
        val bySrc = bySrcTok.groupBy(col("source"))
          .agg(sum(col("a")).as("rs"))
        val totals = bySrc.agg(sum(col("rs")).as("nn"))
        def lterm(o: org.apache.spark.sql.Column,
            e: org.apache.spark.sql.Column) =
          when(o > 0L, o.cast("double") * log(o.cast("double") / e))
            .otherwise(lit(0.0d))
        val nD = col("nn").cast("double")
        val rsD = col("rs").cast("double")
        val cwD = col("cw").cast("double")
        val b = col("cw") - col("a")
        val c = col("rs") - col("a")
        val dd = col("nn") - col("rs") - b
        val ea = rsD * cwD / nD
        val eb = (nD - rsD) * cwD / nD
        val ec = rsD * (nD - cwD) / nD
        val ed = (nD - rsD) * (nD - cwD) / nD
        bySrcTok.join(byTok, "w").join(broadcast(bySrc), "source")
          .join(broadcast(totals))
          .withColumn("g2",
            lit(2.0d) * (lterm(col("a"), ea) + lterm(b, eb) +
              lterm(c, ec) + lterm(dd, ed)))
          .filter(col("g2") > Crit &&
            col("a") * col("nn") > col("rs") * col("cw"))
          .select(col("source"), col("w"), col("a").as("obs"),
            col("cw"), round(col("g2"), 6).as("g2_r"))
          .orderBy(col("source"), col("w"))
      }
    },
    Some(s"""
      WITH toks AS (
        SELECT source, unnest(string_split(${normalizeSql("text")},
                 ' ')) AS w
        FROM documents),
      bysrctok AS (
        SELECT source, w, COUNT(*) AS a
        FROM toks WHERE w <> '' GROUP BY source, w),
      bytok AS (
        SELECT w, CAST(SUM(a) AS BIGINT) AS cw
        FROM bysrctok GROUP BY w
        HAVING SUM(a) >= $MinCount),
      bysrc AS (
        SELECT source, CAST(SUM(a) AS BIGINT) AS rs
        FROM bysrctok GROUP BY source),
      totals AS (SELECT CAST(SUM(rs) AS BIGINT) AS nn FROM bysrc),
      celled AS (
        SELECT st.source, st.w, st.a, tk.cw, sr.rs, tt.nn,
               tk.cw - st.a AS b, sr.rs - st.a AS c,
               tt.nn - sr.rs - (tk.cw - st.a) AS dd,
               CAST(sr.rs AS DOUBLE) * CAST(tk.cw AS DOUBLE)
                 / CAST(tt.nn AS DOUBLE) AS ea,
               (CAST(tt.nn AS DOUBLE) - CAST(sr.rs AS DOUBLE))
                 * CAST(tk.cw AS DOUBLE) / CAST(tt.nn AS DOUBLE) AS eb,
               CAST(sr.rs AS DOUBLE) * (CAST(tt.nn AS DOUBLE)
                 - CAST(tk.cw AS DOUBLE)) / CAST(tt.nn AS DOUBLE) AS ec,
               (CAST(tt.nn AS DOUBLE) - CAST(sr.rs AS DOUBLE))
                 * (CAST(tt.nn AS DOUBLE) - CAST(tk.cw AS DOUBLE))
                 / CAST(tt.nn AS DOUBLE) AS ed
        FROM bysrctok st
        JOIN bytok tk USING (w)
        JOIN bysrc sr USING (source)
        CROSS JOIN totals tt),
      scored AS (
        SELECT source, w, a, cw, rs, nn,
               2.0 * (
                 CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                   * ln(CAST(a AS DOUBLE) / ea) ELSE 0.0 END +
                 CASE WHEN b > 0 THEN CAST(b AS DOUBLE)
                   * ln(CAST(b AS DOUBLE) / eb) ELSE 0.0 END +
                 CASE WHEN c > 0 THEN CAST(c AS DOUBLE)
                   * ln(CAST(c AS DOUBLE) / ec) ELSE 0.0 END +
                 CASE WHEN dd > 0 THEN CAST(dd AS DOUBLE)
                   * ln(CAST(dd AS DOUBLE) / ed) ELSE 0.0 END) AS g2
        FROM celled)
      SELECT source, w, a AS obs, cw, round(g2, 6) AS g2_r
      FROM scored
      WHERE g2 > $Crit AND a * nn > rs * cw
      ORDER BY source, w
    """))

  val all: Seq[GraftQuery] = Seq(q277)
}
