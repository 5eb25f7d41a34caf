package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X226 — Cochran's Q test (Cochran, Biometrika 1950): k binary
  * TREATMENTS applied to the same subjects — do the k quality gates
  * admit the same fraction of documents, or is at least one gate
  * systematically stricter? The k-gate generalization of X216's
  * McNemar (which IS Cochran's Q at k = 2, up to the continuity
  * correction): a curation stack runs a battery of gates, and before
  * debating which gate to keep, the first question is whether their
  * marginal pass rates even differ beyond paired noise.
  *
  * Gates (all exact predicates, the q249 discipline): A — composite
  * quality score ≥ 0.5 ([[TextFeatures.quality]]); B — the hand rule
  * (≥ 20 words AND punct ratio ≤ 0.1); C — mean word length in [3, 8]
  * expressed as the INTEGER comparison 3·n_words ≤ packed_chars ≤
  * 8·n_words (no division anywhere).
  *
  * Determinism: every cell is an exact long; with S = Σ row sums,
  * Q = (k−1)·Σ_j(k·C_j − S)² / (k·(k·S − Σ row²)) keeps numerator and
  * denominator exact longs before ONE double division (the algebra
  * multiplies the textbook Σ(C_j − S/k)² through by k²). All-rows
  * degenerate (every document passes all gates or none: denominator
  * 0) → NULL. Significance against χ²(0.95, k−1 = 2).
  *
  * Scale shape: one corpus scan → one map-side-combined global
  * aggregate; nothing else moves.
  */
object CochranQ {

  /** χ²(0.95, 2). */
  private val Crit = 5.991464547107979

  /** The k = 3 gate battery over documents: doc_id, gate_a/b/c. */
  def gates(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", normalize(col("text")))
      .withColumn("n_words", size(split(col("norm"), " ")))
      .withColumn("packed",
        length(regexp_replace(col("norm"), lit(" "), lit(""))))
      .withColumn("punct_ratio",
        round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
          .cast("double") / length(col("text")), 4))
      .withColumn("gate_a",
        TextFeatures.quality(col("n_words"), col("punct_ratio")) >= 0.5d)
      .withColumn("gate_b",
        col("n_words") >= 20 && col("punct_ratio") <= 0.1d)
      .withColumn("gate_c",
        col("packed") >= lit(3L) * col("n_words") &&
          col("packed") <= lit(8L) * col("n_words"))
      .select(col("doc_id"), col("gate_a"), col("gate_b"), col("gate_c"))

  /** DuckDB mirror of [[gates]] (shared with q264 so the two oracles
    * cannot drift).
    */
  def gatesSql: String = s"""
      scored AS (
        SELECT doc_id,
               len(string_split(${normalizeSql("text")}, ' '))
                 AS n_words,
               length(replace(${normalizeSql("text")}, ' ', ''))
                 AS packed,
               round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                 AS DOUBLE) / length(text), 4) AS punct_ratio
        FROM documents),
      gated AS (
        SELECT doc_id,
               ${TextFeatures.qualitySql("n_words", "punct_ratio")}
                 >= 0.5 AS gate_a,
               n_words >= 20 AND punct_ratio <= 0.1 AS gate_b,
               packed >= 3 * n_words AND packed <= 8 * n_words AS gate_c
        FROM scored)"""

  private def b2l(c: Column): Column = when(c, 1L).otherwise(0L)

  /** q258 — Cochran's Q over the three-gate battery. */
  val q258 = GraftQuery(
    "q258_cochran_q", {
      (s, d) => {
        val k = 3
        val g = gates(t(s, d, "documents"))
          .withColumn("r", b2l(col("gate_a")) + b2l(col("gate_b")) +
            b2l(col("gate_c")))
        g.agg(count(lit(1)).as("n_docs"),
            sum(b2l(col("gate_a"))).as("c_a"),
            sum(b2l(col("gate_b"))).as("c_b"),
            sum(b2l(col("gate_c"))).as("c_c"),
            sum(col("r")).as("s"),
            sum(col("r") * col("r")).as("s2"))
          .withColumn("num", lit((k - 1).toLong) *
            ((lit(k.toLong) * col("c_a") - col("s")) *
              (lit(k.toLong) * col("c_a") - col("s")) +
              (lit(k.toLong) * col("c_b") - col("s")) *
                (lit(k.toLong) * col("c_b") - col("s")) +
              (lit(k.toLong) * col("c_c") - col("s")) *
                (lit(k.toLong) * col("c_c") - col("s"))))
          .withColumn("den",
            lit(k.toLong) * (lit(k.toLong) * col("s") - col("s2")))
          .withColumn("q_stat",
            when(col("den") > 0L,
              round(col("num").cast("double") /
                col("den").cast("double"), 6)))
          .select(col("n_docs"), col("c_a"), col("c_b"), col("c_c"),
            col("q_stat"),
            (col("q_stat") > Crit).as("significant"))
      }
    },
    Some(s"""
      WITH ${gatesSql},
      rows_ AS (
        SELECT (CASE WHEN gate_a THEN 1 ELSE 0 END
                + CASE WHEN gate_b THEN 1 ELSE 0 END
                + CASE WHEN gate_c THEN 1 ELSE 0 END) AS r,
               gate_a, gate_b, gate_c
        FROM gated),
      cells AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN gate_a THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_a,
               CAST(SUM(CASE WHEN gate_b THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_b,
               CAST(SUM(CASE WHEN gate_c THEN 1 ELSE 0 END) AS BIGINT)
                 AS c_c,
               CAST(SUM(r) AS BIGINT) AS s,
               CAST(SUM(r * r) AS BIGINT) AS s2
        FROM rows_)
      SELECT n_docs, c_a, c_b, c_c,
             CASE WHEN 3 * (3 * s - s2) > 0 THEN
               round(CAST(2 * ((3 * c_a - s) * (3 * c_a - s)
                             + (3 * c_b - s) * (3 * c_b - s)
                             + (3 * c_c - s) * (3 * c_c - s)) AS DOUBLE)
                 / CAST(3 * (3 * s - s2) AS DOUBLE), 6) END AS q_stat,
             CASE WHEN 3 * (3 * s - s2) > 0 THEN
               round(CAST(2 * ((3 * c_a - s) * (3 * c_a - s)
                             + (3 * c_b - s) * (3 * c_b - s)
                             + (3 * c_c - s) * (3 * c_c - s)) AS DOUBLE)
                 / CAST(3 * (3 * s - s2) AS DOUBLE), 6) END > $Crit
               AS significant
      FROM cells
    """))

  val all: Seq[GraftQuery] = Seq(q258)
}
