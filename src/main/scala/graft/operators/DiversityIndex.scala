package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X221 — lexical diversity indices per language: Simpson
  * concentration λ = Σ nᵢ(nᵢ−1) / (N(N−1)) (Simpson 1949 — the
  * probability two random tokens are the same type), Shannon entropy
  * H = ln N − (1/N)·Σ nᵢ ln nᵢ (Shannon 1948, in nats), and Pielou
  * evenness J = H / ln V (Pielou 1966). The within-corpus diversity
  * complement to the drift tier: q152's Gini ranks CONCENTRATION of
  * volume over items, q95's Zipf fits the rank-frequency slope; these
  * are the bounded summary indices a curation dashboard tracks per
  * language to spot template floods (λ up, J down) before a Zipf
  * refit would.
  *
  * Determinism: the count-of-counts rewrite makes every sum exact or
  * fixed-order — λ's numerator Σ m_c·c·(c−1) is an exact long; the
  * entropy sum Σ nᵢ ln nᵢ = Σ_c m_c·c·ln c runs over the TINY
  * count-of-counts frame as DECIMAL(30,14) terms (the q162/q95
  * recipe; each term is one fixed double tree over longs, ln c = ln of
  * an integer). Single-type groups (V = 1) → J NULL; N < 2 → λ NULL.
  *
  * Scale shape: |langs × vocabulary| count frame → |langs × distinct
  * counts| count-of-counts frame (hundreds of rows) → one row per
  * lang. No corpus-sized collect, no giant fold — the per-type ln
  * terms never materialize (grouped by multiplicity instead).
  */
object DiversityIndex {

  /** q254 — per-language Simpson λ, Shannon H, Pielou J. */
  val q254 = GraftQuery(
    "q254_diversity_index", {
      (s, d) => {
        val counts = t(s, d, "documents")
          .select(col("lang"),
            explode(split(normalize(col("text")), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("lang"), col("w"))
          .agg(count(lit(1)).as("c"))
        val coc = counts.groupBy(col("lang"), col("c"))
          .agg(count(lit(1)).as("m"))
        coc.groupBy(col("lang"))
          .agg(sum(col("m") * col("c")).as("n_tokens"),
            sum(col("m")).as("vocab"),
            sum(col("m") * col("c") * (col("c") - 1L)).as("simp_num"),
            sum((col("m").cast("double") * col("c").cast("double") *
              log(col("c").cast("double"))).cast("decimal(30,14)"))
              .cast("double").as("s_nln"))
          .withColumn("simpson",
            when(col("n_tokens") > 1L,
              round(col("simp_num").cast("double") /
                (col("n_tokens").cast("double") *
                  (col("n_tokens").cast("double") - 1.0d)), 6)))
          .withColumn("shannon",
            round(log(col("n_tokens").cast("double")) -
              col("s_nln") / col("n_tokens").cast("double"), 6))
          .withColumn("evenness",
            when(col("vocab") > 1L,
              round((log(col("n_tokens").cast("double")) -
                col("s_nln") / col("n_tokens").cast("double")) /
                log(col("vocab").cast("double")), 6)))
          .select(col("lang"), col("n_tokens"), col("vocab"),
            col("simpson"), col("shannon"), col("evenness"))
          .orderBy(col("lang"))
      }
    },
    Some(s"""
      WITH toks AS (
        SELECT lang, w
        FROM (SELECT lang,
                     unnest(string_split(${normalizeSql("text")}, ' '))
                       AS w
              FROM documents)
        WHERE w <> ''),
      counts AS (
        SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
      coc AS (
        SELECT lang, c, COUNT(*) AS m FROM counts GROUP BY 1, 2),
      census AS (
        SELECT lang,
               CAST(SUM(m * c) AS BIGINT) AS n_tokens,
               CAST(SUM(m) AS BIGINT) AS vocab,
               CAST(SUM(m * c * (c - 1)) AS BIGINT) AS simp_num,
               CAST(SUM(CAST(
                 CAST(m AS DOUBLE) * CAST(c AS DOUBLE)
                   * ln(CAST(c AS DOUBLE))
                 AS DECIMAL(30,14))) AS DOUBLE) AS s_nln
        FROM coc GROUP BY lang)
      SELECT lang, n_tokens, vocab,
             CASE WHEN n_tokens > 1 THEN
               round(CAST(simp_num AS DOUBLE) /
                 (CAST(n_tokens AS DOUBLE)
                   * (CAST(n_tokens AS DOUBLE) - 1.0)), 6)
             END AS simpson,
             round(ln(CAST(n_tokens AS DOUBLE))
               - s_nln / CAST(n_tokens AS DOUBLE), 6) AS shannon,
             CASE WHEN vocab > 1 THEN
               round((ln(CAST(n_tokens AS DOUBLE))
                 - s_nln / CAST(n_tokens AS DOUBLE))
                 / ln(CAST(vocab AS DOUBLE)), 6)
             END AS evenness
      FROM census
      ORDER BY lang
    """))

  val all: Seq[GraftQuery] = Seq(q254)
}
