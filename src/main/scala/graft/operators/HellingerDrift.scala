package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X230 — Hellinger affinity / distance between each source's unigram
  * distribution and the REST of the corpus (Hellinger 1909; the
  * Bhattacharyya coefficient BC = Σ√(p·q) is the affinity, Kailath
  * IEEE 1967): the bounded, symmetric, √-kernel drift metric next to
  * X218's Jensen–Shannon (ln-kernel). Why both exist in one engine:
  * JSD weights disagreement by information content (a token 10× more
  * likely in p than q contributes ~p·ln2-ish), Hellinger by
  * probability mass geometry (√p−√q)² — H is the one with a true
  * metric's triangle inequality and the standard choice for "which
  * source is the distribution outlier" leaderboards. H² = 1 − BC;
  * leave-one-out contrast (source vs rest) so a dominant source
  * cannot mask its own drift by being most of the pool.
  *
  * Determinism: token counts are exact longs; each row's √(p·q) is
  * ONE fixed double tree over four longs; the per-source sum crosses
  * the aggregation as DECIMAL(30,14) (q162 lanes); BC ≤ 1 holds
  * mathematically (Cauchy–Schwarz) but the decimal round-trip can
  * land at 1+ε on degenerate identical distributions, so H takes
  * √max(0, 1−BC) on BOTH engines. Rounded at 6 dp.
  *
  * Scale shape: one scan → the (source, w) census (the q253 frame) →
  * one |vocab|-keyed join to per-token global totals → a per-source
  * decimal fold. Nothing wider than the vocabulary moves.
  */
object HellingerDrift {

  /** q262 — per-source Hellinger distance to the rest of the corpus. */
  val q262 = GraftQuery(
    "q262_hellinger_drift", {
      (s, d) => {
        val counts = t(s, d, "documents")
          .select(col("source"),
            explode(split(normalize(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
        val bySrc = counts.groupBy(col("source"))
          .agg(sum(col("c")).as("n_s"))
        val byTok = counts.groupBy(col("w")).agg(sum(col("c")).as("ct"))
        val total = bySrc.agg(sum(col("n_s")).as("n_tot"))
        val terms = counts
          .join(byTok, "w")
          .join(broadcast(bySrc), "source")
          .join(broadcast(total))
          // single-source corpus: no "rest" to compare against —
          // NULL term (ANSI would otherwise throw on the 0 divisor)
          .withColumn("term",
            when(col("n_tot") > col("n_s"),
              sqrt(col("c").cast("double") / col("n_s").cast("double") *
                ((col("ct") - col("c")).cast("double") /
                  (col("n_tot") - col("n_s")).cast("double")))))
        terms.groupBy(col("source"))
          .agg(max(col("n_s")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum(col("term").cast("decimal(30,14)")).cast("double")
              .as("bc"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            round(col("bc"), 6).as("bc_r"),
            when(col("bc").isNotNull,
              round(sqrt(greatest(lit(0.0d), lit(1.0d) - col("bc"))),
                6)).as("hellinger"))
          .orderBy(col("source"))
      }
    },
    Some(s"""
      WITH toks AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(string_split(${normalizeSql("text")}, ' '))
                       AS w
              FROM documents)
        WHERE w <> ''),
      counts AS (
        SELECT source, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      bysrc AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
        FROM counts GROUP BY 1),
      bytok AS (
        SELECT w, CAST(SUM(c) AS BIGINT) AS ct FROM counts GROUP BY 1),
      total AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n_tot FROM bysrc),
      terms AS (
        SELECT counts.source,
               CASE WHEN n_tot > n_s THEN
                 sqrt(CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE)
                   * (CAST(ct - c AS DOUBLE)
                      / CAST(n_tot - n_s AS DOUBLE))) END AS term
        FROM counts
        JOIN bytok USING (w)
        JOIN bysrc USING (source)
        CROSS JOIN total),
      folded AS (
        SELECT source, COUNT(*) AS vocab,
               CAST(SUM(CAST(term AS DECIMAL(30,14))) AS DOUBLE) AS bc
        FROM terms GROUP BY 1)
      SELECT folded.source, n_s AS n_tokens, vocab,
             round(bc, 6) AS bc_r,
             CASE WHEN bc IS NOT NULL THEN
               round(sqrt(greatest(0.0, 1.0 - bc)), 6) END AS hellinger
      FROM folded JOIN bysrc ON bysrc.source = folded.source
      ORDER BY folded.source
    """))

  val all: Seq[GraftQuery] = Seq(q262)
}
