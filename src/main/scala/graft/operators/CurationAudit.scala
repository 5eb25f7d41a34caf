package graft.operators

import org.apache.spark.sql.functions._

import graft.functions.MockScorers.{normalize, normalizeSql}
import Q._

/** X93 — curation decision audit with a reasons BITMAP: per document,
  * every drop reason the funnel would apply, encoded as one integer
  * mask — the explainability face the kept/dropped split (q87) throws
  * away. A production curation run must answer "WHY did doc X drop"
  * and "what is reason-cooccurrence" (docs failing quality AND
  * language need different upstream fixes than quality alone); the
  * bitmap answers both in one pass, and diffing two audits localizes
  * a pipeline regression to the exact gate that moved.
  *
  * Gates reuse the engine's single definitions (the TextFeatures/Pii
  * discipline — drift between this audit and the enforcing funnel
  * would make the audit a lie): bit 0 too-short (n_words < 20), bit 1
  * low quality (q48's formula < 0.3, the CurationIngest gate), bit 2
  * PII present (the q70 regexes, detection face), bit 3 non-English
  * (q47's marker decision), bit 4 repetitive (top word > 20 % of
  * tokens — the q69 repetition face as a gate; evaluated only at
  * n_words ≥ the length floor, because any ≤4-word doc trips a 20 %
  * top-word fraction trivially and the short bit already owns that).
  *
  * Determinism: every component is integer counts, the q48 rounded
  * quality, or a regex count — bit arithmetic is exact; kept ⟺
  * mask = 0. Scale shape: bits 0–3 are map-only column math; bit 4 is
  * the one shuffle — (doc_id, tok) counts with map-side combine, max
  * per doc — and the bitmap assembly is a broadcast-free projection.
  */
object CurationAudit {

  val MinWords = 20
  val MinQuality = 0.3
  val MaxTopWordFrac = 0.2

  /** q143 — per-doc decision audit over the corpus. */
  val q143 = GraftQuery(
    "q143_curation_audit", {
      (s, d) => {
        val docs = t(s, d, "documents")
        val base = docs
          .withColumn("norm", normalize(col("text")))
          .withColumn("w", split(col("norm"), " "))
          .withColumn("n_words", size(col("w")).cast("long"))
        val scored = TextFeatures.withLangScores(base, col("norm"))
          .withColumn("lang_pred", TextFeatures.predicted)
          .withColumn("punct_ratio",
            round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
              .cast("double") / length(col("text")), 4))
          .withColumn("quality",
            TextFeatures.quality(col("n_words"), col("punct_ratio")))
          .withColumn("pii_hit",
            regexp_count(col("text"), lit(Pii.EmailRe)) +
              regexp_count(col("text"), lit(Pii.UrlRe)) +
              regexp_count(col("text"), lit(Pii.PhoneRe)) > 0)
        val topWord = base
          .select(col("doc_id"), col("n_words"),
            explode(col("w")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
        scored.join(topWord, "doc_id")
          .withColumn("r_short", col("n_words") < MinWords)
          .withColumn("r_quality", col("quality") < MinQuality)
          .withColumn("r_pii", col("pii_hit"))
          .withColumn("r_lang", col("lang_pred") =!= "en")
          // integer-exact fraction test: 5·top_c > n_words ⟺ >20 %;
          // only meaningful at adequate length (see scaladoc)
          .withColumn("r_repeat", col("n_words") >= MinWords &&
            col("top_c") * lit(5L) > col("n_words"))
          .withColumn("reasons_mask",
            when(col("r_short"), 1L).otherwise(0L) +
              when(col("r_quality"), 2L).otherwise(0L) +
              when(col("r_pii"), 4L).otherwise(0L) +
              when(col("r_lang"), 8L).otherwise(0L) +
              when(col("r_repeat"), 16L).otherwise(0L))
          .select(col("doc_id"), col("reasons_mask"),
            (col("reasons_mask") === 0L).as("kept"),
            col("r_short"), col("r_quality"), col("r_pii"),
            col("r_lang"), col("r_repeat"))
          .orderBy(col("doc_id"))
      }
    },
    Some(s"""
      WITH base AS (
        SELECT doc_id, text, ${normalizeSql("text")} AS norm
        FROM documents),
      wf AS (
        SELECT doc_id,
               CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words,
               ${TextFeatures.langScoresSql("norm")},
               round(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                 AS DOUBLE) / len(text), 4) AS punct_ratio,
               CASE WHEN len(regexp_extract_all(text, '${Pii.EmailRe}'))
                      + len(regexp_extract_all(text, '${Pii.UrlRe}'))
                      + len(regexp_extract_all(text,
                          '\\+[0-9]{7,}')) > 0
                    THEN true ELSE false END AS pii_hit,
               norm
        FROM base),
      scored AS (
        SELECT doc_id, n_words, pii_hit,
               ${TextFeatures.predictedSql} AS lang_pred,
               round(least(1.0, CAST(n_words AS DOUBLE) / 50)
                 * (1.0 - punct_ratio), 4) AS quality,
               norm
        FROM wf),
      topword AS (
        SELECT doc_id, max(c) AS top_c FROM (
          SELECT doc_id, tok, count(*) AS c FROM (
            SELECT doc_id, unnest(string_split(norm, ' ')) AS tok
            FROM base) WHERE tok <> '' GROUP BY 1, 2)
        GROUP BY 1),
      flags AS (
        SELECT s.doc_id,
               s.n_words < $MinWords AS r_short,
               s.quality < $MinQuality AS r_quality,
               s.pii_hit AS r_pii,
               s.lang_pred <> 'en' AS r_lang,
               s.n_words >= $MinWords AND t.top_c * 5 > s.n_words
                 AS r_repeat
        FROM scored s JOIN topword t USING (doc_id))
      SELECT doc_id,
             CAST(CASE WHEN r_short THEN 1 ELSE 0 END
               + CASE WHEN r_quality THEN 2 ELSE 0 END
               + CASE WHEN r_pii THEN 4 ELSE 0 END
               + CASE WHEN r_lang THEN 8 ELSE 0 END
               + CASE WHEN r_repeat THEN 16 ELSE 0 END AS BIGINT)
               AS reasons_mask,
             NOT (r_short OR r_quality OR r_pii OR r_lang OR r_repeat)
               AS kept,
             r_short, r_quality, r_pii, r_lang, r_repeat
      FROM flags
      ORDER BY doc_id
    """))

  val all: Seq[GraftQuery] = Seq(q143)
}
