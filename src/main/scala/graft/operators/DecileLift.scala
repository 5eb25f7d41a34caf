package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X181 — decile lift & gains table (the direct-marketing /
  * model-eval standard; Berry & Linoff 1997): rank the population by
  * a model score, cut into 10 equal NTILE deciles, and report per
  * decile the label rate, lift over base rate, and cumulative
  * capture — "the top decile holds 3.2× its share of positives" is
  * THE go/no-go read on a ranking model, the threshold-free
  * companion to X88's ECE (calibration) and X112's rank metrics
  * (per-query retrieval; this is population-level).
  *
  * Scored here: X63's frozen hashed-ngram classifier margin (its
  * integer weight-sum s — the same total order, no float
  * re-derivation) against the label "document is English" — a real
  * question of that score (the weight table is language-blind, so
  * the table QUANTIFIES how much language signal the quality score
  * accidentally carries — a leakage audit, not a victory lap).
  *
  * Determinism: ranking is the total (s desc, doc_id) order; NTILE
  * bucket arithmetic is integer (the X176 rule); counts exact longs;
  * rate/lift/capture are fixed double trees — lift = (pos·N)/(n·P)
  * computed as exact long products before ONE division each.
  *
  * Scale shape (r19 — VERDICT r18 item 1): one token explode →
  * map-side per-doc groupBy (the q111 exchange); the NTILE over the
  * |docs| score frame is the q149 two-level count-prefix swap
  * ([[RankSum.bucketedRowNumber]] + [[RankSum.ntileOf]]) — bucket
  * counts, a ≤1025-row offsets frame, a bucket-PARTITIONED
  * row_number, integer tile arithmetic; no single-partition window
  * ever sees the corpus frame (PlanSpec-gated). Then one groupBy to
  * 10 rows + prefix windows on those 10.
  */
object DecileLift {

  val Deciles = 10

  /** q219 — lift/gains of the quality margin against lang='en'. */
  val q219 = GraftQuery(
    "q219_decile_lift", {
      (s, d) => {
        val docs = t(s, d, "documents")
        val scored = docs
          .select(col("doc_id"), col("lang"),
            explode(split(graft.functions.MockScorers
              .normalize(col("text")), " ")).as("w"))
          .select(col("doc_id"), col("lang"),
            QualityClassifier.bucketWeight(
              QualityClassifier.wordBucket(col("w"))).as("wgt"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("wgt")).as("s"))
        val cut = RankSum.bucketedRowNumber(scored,
            -col("s").cast("double"), "rn", withTotal = true,
            col("s").desc, col("doc_id"))
          .withColumn("decile",
            RankSum.ntileOf(col("rn"), col("n_total"), Deciles))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("pos"))
        val wAll = Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val wPre = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cut
          .withColumn("n_all", sum(col("n")).over(wAll))
          .withColumn("pos_all", sum(col("pos")).over(wAll))
          .withColumn("cum_pos", sum(col("pos")).over(wPre))
          .select(col("decile"), col("n"), col("pos"),
            (col("pos").cast("double") / col("n").cast("double"))
              .as("pos_rate"),
            // a population with zero positives has no base rate —
            // lift/capture are NULL, not a divide-by-zero
            when(col("pos_all") > 0,
              (col("pos") * col("n_all")).cast("double") /
                (col("n") * col("pos_all")).cast("double"))
              .as("lift"),
            when(col("pos_all") > 0,
              col("cum_pos").cast("double") /
                col("pos_all").cast("double"))
              .as("cum_capture"))
          .orderBy(col("decile"))
      }
    },
    Some(s"""
      WITH words AS (
        SELECT doc_id, lang,
               unnest(string_split(${graft.functions.MockScorers
      .normalizeSql("text")}, ' ')) AS w
        FROM documents),
      scored AS (
        SELECT doc_id, lang,
               SUM((CAST((length(w) * 17 + ascii(w) * 31
                          + ascii(reverse(w))) % 4096 AS BIGINT)
                    * 1103515245 + 12345) % 2001 - 1000) AS s
        FROM words GROUP BY 1, 2),
      cut AS (
        SELECT CAST(NTILE($Deciles) OVER (ORDER BY s DESC, doc_id)
                 AS INTEGER) AS decile,
               lang
        FROM scored),
      census AS (
        SELECT decile, COUNT(*) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 AS BIGINT) AS pos
        FROM cut GROUP BY decile)
      SELECT decile, n, pos,
             CAST(pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
             CASE WHEN SUM(pos) OVER () > 0 THEN
               CAST(pos * SUM(n) OVER () AS DOUBLE) /
                 CAST(n * SUM(pos) OVER () AS DOUBLE) END AS lift,
             CASE WHEN SUM(pos) OVER () > 0 THEN
               CAST(SUM(pos) OVER (ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / CAST(SUM(pos) OVER () AS DOUBLE)
               END AS cum_capture
      FROM census
      ORDER BY decile
    """))

  val all: Seq[GraftQuery] = Seq(q219)
}
