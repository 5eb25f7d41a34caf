package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X216 — McNemar's paired-disagreement test (McNemar 1947) between
  * two quality GATES on the same documents: the composite quality
  * score (q48/q81's formula at the 0.5 bar) vs the hand rule
  * (≥ 20 words AND punctuation ratio ≤ 0.1). Two curation gates that
  * "mostly agree" can still disagree SYSTEMATICALLY — one strictly
  * admits what the other rejects — and that asymmetry (b vs c), not
  * the agreement rate, is what decides whether swapping gates shifts
  * the corpus. X108's κ measures agreement strength; McNemar tests
  * the DIRECTION of the disagreement, on the discordant pairs only —
  * the classifier-replacement A/B for gates.
  *
  * Determinism: both gates are exact predicates over integer/4-dp
  * leaves (the shared [[TextFeatures.quality]] tree, already
  * hash-exact in q48/q81); b, c and the agreement cells are exact
  * longs; the continuity-corrected χ² = (|b−c|−1)²/(b+c) is one fixed
  * double tree. No discordant pairs (b + c = 0) → NULL χ².
  *
  * Scale shape: one corpus scan, one map-side-combined global
  * aggregate; nothing else.
  */
object McNemar {

  /** χ²(0.95, 1). */
  private val Crit = 3.841458820694124

  /** q249 — quality-score gate vs hand-rule gate, paired per doc. */
  val q249 = GraftQuery(
    "q249_mcnemar_gates", {
      (s, d) => {
        val scored = t(s, d, "documents")
          .withColumn("norm", normalize(col("text")))
          .withColumn("n_words", size(split(col("norm"), " ")))
          .withColumn("punct_ratio",
            round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
              .cast("double") / length(col("text")), 4))
          .withColumn("quality",
            TextFeatures.quality(col("n_words"), col("punct_ratio")))
          .withColumn("gate_a", col("quality") >= 0.5d)
          .withColumn("gate_b",
            col("n_words") >= 20 && col("punct_ratio") <= 0.1d)
        scored
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("gate_a") && col("gate_b"), 1L).otherwise(0L))
              .as("both_pass"),
            sum(when(col("gate_a") && !col("gate_b"), 1L).otherwise(0L))
              .as("only_a"),
            sum(when(!col("gate_a") && col("gate_b"), 1L).otherwise(0L))
              .as("only_b"),
            sum(when(!col("gate_a") && !col("gate_b"), 1L).otherwise(0L))
              .as("neither"))
          .withColumn("chi2",
            when(col("only_a") + col("only_b") > 0L,
              round((abs(col("only_a") - col("only_b"))
                .cast("double") - 1.0d) *
                (abs(col("only_a") - col("only_b"))
                  .cast("double") - 1.0d) /
                (col("only_a") + col("only_b")).cast("double"), 6)))
          .withColumn("asymmetric", col("chi2") > Crit)
      }
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id,
               len(string_split(${normalizeSql("text")}, ' '))
                 AS n_words,
               round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                 AS DOUBLE) / length(text), 4) AS punct_ratio
        FROM documents),
      gated AS (
        SELECT ${TextFeatures.qualitySql("n_words", "punct_ratio")}
                 >= 0.5 AS gate_a,
               n_words >= 20 AND punct_ratio <= 0.1 AS gate_b
        FROM scored),
      cells AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN gate_a AND gate_b THEN 1 ELSE 0 END)
                 AS BIGINT) AS both_pass,
               CAST(SUM(CASE WHEN gate_a AND NOT gate_b THEN 1 ELSE 0
                 END) AS BIGINT) AS only_a,
               CAST(SUM(CASE WHEN NOT gate_a AND gate_b THEN 1 ELSE 0
                 END) AS BIGINT) AS only_b,
               CAST(SUM(CASE WHEN NOT gate_a AND NOT gate_b THEN 1
                 ELSE 0 END) AS BIGINT) AS neither
        FROM gated)
      SELECT n_docs, both_pass, only_a, only_b, neither,
             CASE WHEN only_a + only_b > 0 THEN
               round((CAST(ABS(only_a - only_b) AS DOUBLE) - 1.0)
                 * (CAST(ABS(only_a - only_b) AS DOUBLE) - 1.0)
                 / CAST(only_a + only_b AS DOUBLE), 6) END AS chi2,
             CASE WHEN only_a + only_b > 0 THEN
               round((CAST(ABS(only_a - only_b) AS DOUBLE) - 1.0)
                 * (CAST(ABS(only_a - only_b) AS DOUBLE) - 1.0)
                 / CAST(only_a + only_b AS DOUBLE), 6) END > $Crit
               AS asymmetric
      FROM cells
    """))

  val all: Seq[GraftQuery] = Seq(q249)
}
