package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X235 — Kendall's coefficient of concordance W (Kendall & Babington
  * Smith, Ann. Math. Stat. 1939): how much do m JUDGES agree on one
  * ranking of n objects? Applied to the engine's own curation stack:
  * the three q174 quality signals (token count, mean word length,
  * alpha density) each induce a total order over the corpus — W says
  * whether fusing them (q174's RRF) is aggregating CONSENSUS or
  * averaging noise (W → 1/m means the fusion is arbitrary; the
  * monotone map to the mean pairwise Spearman ρ̄ = (mW−1)/(m−1) is
  * reported alongside). The m-ranker generalization of q246's
  * pairwise τ and the agreement face of the q267/q155/q259 ladder
  * for RANKINGS rather than labels.
  *
  * Ranks are the q174 total orders (signal desc, doc_id) computed
  * with [[RankSum.bucketedRowNumbers]] — one flat two-level swap, no
  * single-partition window over the corpus (the r19 q174/q214
  * machinery, shared code). The doc_id tiebreak makes each ranking a
  * PERMUTATION, so the no-tie W formula is exact by construction
  * (stated: a midrank variant would need the tie-correction term).
  *
  * Determinism: per-document doubled deviation 2R_i − m(n+1) is an
  * exact long; its square is one double tree summed as DECIMAL(38,6)
  * lanes (q162); W = S4/(m²/3·... folded to S4/(3(n³−n)) for m = 3)
  * is one final double tree with the n³ factor taken in doubles
  * (long n³ overflows past n ≈ 2M). n ≤ 1 → NULL.
  *
  * Scale shape: the q174 scale shape exactly — checkpointed signal
  * frame, three bucket exchanges, a 1-row decimal fold.
  */
object KendallW {

  val Judges = 3

  /** q267 — concordance of the three quality-signal rankings. */
  val q267 = GraftQuery(
    "q267_kendall_w", {
      (s, d) => {
        val m = Judges
        val sig = graft.Checkpoints.eager(t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            normalize(col("text")).as("norm"))
          .select(col("doc_id"),
            size(split(col("norm"), " ")).as("n_words"),
            (length(regexp_replace(col("norm"), " ", "")).cast("double") /
              size(split(col("norm"), " ")).cast("double"))
              .as("word_len"),
            (regexp_count(col("text"), lit("[a-zA-Z]")).cast("double") /
              length(col("text")).cast("double")).as("alpha_ratio")))
        val ranked = RankSum.bucketedRowNumbers(sig, Seq(
          RankSum.RankSpec(-col("n_words").cast("double"), "rn_w",
            Seq(col("n_words").desc, col("doc_id"))),
          RankSum.RankSpec(-col("word_len"), "rn_l",
            Seq(col("word_len").desc, col("doc_id"))),
          RankSum.RankSpec(-col("alpha_ratio"), "rn_a",
            Seq(col("alpha_ratio").desc, col("doc_id")))),
          withTotal = true)
        ranked
          .withColumn("dev2",
            lit(2L) * (col("rn_w") + col("rn_l") + col("rn_a")) -
              lit(m.toLong) * (col("n_total") + 1L))
          .agg(max(col("n_total")).as("n"),
            sum((col("dev2").cast("double") * col("dev2").cast("double"))
              .cast("decimal(38,6)")).cast("double").as("s4"))
          .select(col("n").as("n_docs"),
            when(col("n") > 1L, round(col("s4") /
              (lit(3.0d) * (col("n").cast("double") *
                col("n").cast("double") * col("n").cast("double") -
                col("n").cast("double"))), 6)).as("w_r"),
            when(col("n") > 1L, round((lit(m.toDouble) * (col("s4") /
              (lit(3.0d) * (col("n").cast("double") *
                col("n").cast("double") * col("n").cast("double") -
                col("n").cast("double")))) - 1.0d) /
              lit((m - 1).toDouble), 6)).as("rho_avg_r"))
      }
    },
    Some(s"""
      WITH sig AS (
        SELECT doc_id,
               CAST(len(string_split(${normalizeSql("text")}, ' '))
                 AS INTEGER) AS n_words,
               CAST(len(replace(${normalizeSql("text")}, ' ', ''))
                   AS DOUBLE)
                 / CAST(len(string_split(${normalizeSql("text")}, ' '))
                   AS DOUBLE) AS word_len,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE)
                 / CAST(len(text) AS DOUBLE) AS alpha_ratio
        FROM documents),
      ranked AS (
        SELECT row_number() OVER (ORDER BY n_words DESC, doc_id)
                 + row_number() OVER (ORDER BY word_len DESC, doc_id)
                 + row_number() OVER (ORDER BY alpha_ratio DESC, doc_id)
                 AS rsum,
               COUNT(*) OVER () AS n
        FROM sig),
      folded AS (
        SELECT MAX(n) AS n,
               CAST(SUM(CAST(CAST(2 * rsum - 3 * (n + 1) AS DOUBLE)
                 * CAST(2 * rsum - 3 * (n + 1) AS DOUBLE)
                 AS DECIMAL(38,6))) AS DOUBLE) AS s4
        FROM ranked),
      stats AS (
        SELECT n, s4,
               CASE WHEN n > 1 THEN s4 / (3.0 * (CAST(n AS DOUBLE)
                 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 - CAST(n AS DOUBLE))) END AS w
        FROM folded)
      SELECT CAST(n AS BIGINT) AS n_docs,
             round(w, 6) AS w_r,
             round((3.0 * w - 1.0) / 2.0, 6) AS rho_avg_r
      FROM stats
    """))

  val all: Seq[GraftQuery] = Seq(q267)
}
