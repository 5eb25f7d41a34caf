package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X95 — cross-source score calibration by quantile mapping: each
  * document's quality score is re-expressed as the GLOBAL score at
  * its within-source decile — the standard fix when heterogeneous
  * crawl sources ship incomparable score scales (one source's 0.4 is
  * another's 0.7; a single global threshold then silently biases the
  * kept mix toward lenient-scoring sources, cf. quantile/histogram
  * equalization in every multi-source ranking stack). After
  * calibration a global cut keeps the same FRACTION per source while
  * preserving within-source order.
  *
  * Determinism: deciles are exact integer ntiles on the total
  * (quality, doc_id) order; the global decile-midpoint vector is one
  * exact interpolated percentile over the 4-dp quality values (Spark
  * `percentile` ≡ DuckDB `quantile_cont` — index p·(n−1), one
  * lower+(upper−lower)·frac interpolation of identical doubles); the
  * lookup is an integer element_at.
  *
  * Scale shape: one window per source partition (ntile — single-pass
  * per partition), one global percentile agg (the X88 caveat: exact
  * percentile sorts; the 100 TB swap is q75's GK sketch with the
  * same plan shape), the midpoint vector broadcast as a 10-double
  * frame.
  */
object ScoreCalibration {

  /** Decile midpoints for the global quantile vector. */
  private val Mids: Seq[Double] =
    (0 until 10).map(i => (2 * i + 1) / 20.0)

  /** q145 — per-doc calibrated quality over the corpus. */
  val q145 = GraftQuery(
    "q145_score_calibration", {
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("norm",
            graft.functions.MockScorers.normalize(col("text")))
          .withColumn("n_words", size(split(col("norm"), " ")))
          .withColumn("punct_ratio",
            round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
              .cast("double") / length(col("text")), 4))
          .withColumn("quality",
            TextFeatures.quality(col("n_words"), col("punct_ratio")))
          .select(col("doc_id"), col("source"), col("quality"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("quality"), col("doc_id"))
        val glob = docs.agg(expr(
          s"percentile(quality, array(${Mids.mkString(", ")}))")
          .as("gq"))
        docs
          .withColumn("src_decile", ntile(10).over(w))
          .join(broadcast(glob))
          .withColumn("calibrated",
            element_at(col("gq"), col("src_decile")))
          .select(col("doc_id"), col("source"), col("quality"),
            col("src_decile"), round(col("calibrated"), 4)
              .as("calibrated_r"))
          .orderBy(col("doc_id"))
      }
    },
    Some(s"""
      WITH scored AS (
        SELECT doc_id, source,
               round(least(1.0, CAST(len(string_split(
                   ${graft.functions.MockScorers.normalizeSql("text")},
                   ' ')) AS DOUBLE) / 50)
                 * (1.0 - round(CAST(len(regexp_extract_all(text,
                     '[^a-zA-Z0-9 ]')) AS DOUBLE) / len(text), 4)), 4)
                 AS quality
        FROM documents),
      gall AS (
        SELECT quantile_cont(quality,
          [${Mids.mkString(", ")}]) AS gq
        FROM scored),
      tiles AS (
        SELECT doc_id, source, quality,
               ntile(10) OVER (PARTITION BY source
                 ORDER BY quality, doc_id) AS src_decile
        FROM scored)
      SELECT t.doc_id, t.source, t.quality,
             CAST(t.src_decile AS INTEGER) AS src_decile,
             round(g.gq[t.src_decile], 4) AS calibrated_r
      FROM tiles t CROSS JOIN gall g
      ORDER BY t.doc_id
    """))

  val all: Seq[GraftQuery] = Seq(q145)
}
