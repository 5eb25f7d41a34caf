package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X240 — Cronbach's α (Cronbach 1951) over the engine's quality-signal
  * battery: do the four per-document quality items — length score,
  * punctuation cleanliness, stopword naturalness, digit sparsity —
  * measure ONE underlying construct, or is the composite quality gate
  * (q48/q81) averaging unrelated meters? α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total)
  * is the standard internal-consistency check a labeling/curation
  * pipeline runs before trusting a composite score: α near 1 means the
  * items co-vary (one construct), α near 0 means the composite's value
  * is an artifact of whichever item dominates.
  *
  * Determinism: each item is a 4-dp feature cast to DECIMAL(10,4)
  * (exact); every sum and sum-of-squares the variances need is a pure
  * decimal aggregate (squares are DECIMAL(20,8), still exact), and the
  * ONLY doubles are the final one-tree variance/α expressions over
  * those exact decimal totals (each < 2⁵³ in scaled units, so the
  * casts are exact). Population variances (÷n) on both engines.
  *
  * Scale shape: one corpus scan → one map-side-combined global
  * aggregate row; all item columns live side by side so no cross-row
  * double sum ever forms. At 100 TB this is a single reduce.
  */
object CronbachAlpha {

  /** q279 — α of the four-item document quality battery. */
  val q279 = GraftQuery(
    "q279_cronbach_alpha", {
      (s, d) => {
        val f = t(s, d, "documents")
          .withColumn("norm", normalize(col("text")))
          .withColumn("n_chars_raw", length(col("text")))
          .withColumn("n_words", size(split(col("norm"), " ")))
          .withColumn("i1",
            round(least(lit(1.0d),
              col("n_words").cast("double") / 50), 4)
              .cast("decimal(10,4)"))
          .withColumn("i2",
            (lit(1.0d) -
              round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
                .cast("double") / col("n_chars_raw"), 4))
              .cast("decimal(10,4)"))
          .withColumn("i3",
            round(regexp_count(col("norm"),
              lit("\\b(the|of|and|to|is|a)\\b"))
              .cast("double") / col("n_words"), 4)
              .cast("decimal(10,4)"))
          .withColumn("i4",
            (lit(1.0d) -
              round(regexp_count(col("text"), lit("[0-9]"))
                .cast("double") / col("n_chars_raw"), 4))
              .cast("decimal(10,4)"))
          .withColumn("tot",
            col("i1") + col("i2") + col("i3") + col("i4"))
        def popVar(sx: org.apache.spark.sql.Column,
            sxx: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (n.cast("double") * sxx.cast("double") -
            sx.cast("double") * sx.cast("double")) /
            (n.cast("double") * n.cast("double"))
        val agg = f.agg(count(lit(1)).as("n"),
          sum(col("i1")).as("s1"), sum(col("i1") * col("i1")).as("q1"),
          sum(col("i2")).as("s2"), sum(col("i2") * col("i2")).as("q2"),
          sum(col("i3")).as("s3"), sum(col("i3") * col("i3")).as("q3"),
          sum(col("i4")).as("s4"), sum(col("i4") * col("i4")).as("q4"),
          sum(col("tot")).as("st"),
          sum(col("tot") * col("tot")).as("qt"))
        agg
          .withColumn("v1", popVar(col("s1"), col("q1"), col("n")))
          .withColumn("v2", popVar(col("s2"), col("q2"), col("n")))
          .withColumn("v3", popVar(col("s3"), col("q3"), col("n")))
          .withColumn("v4", popVar(col("s4"), col("q4"), col("n")))
          .withColumn("vt", popVar(col("st"), col("qt"), col("n")))
          .withColumn("alpha",
            when(col("vt") > 0d && col("n") > 1L,
              lit(4.0d / 3.0d) *
                (lit(1.0d) - (col("v1") + col("v2") + col("v3") +
                  col("v4")) / col("vt"))))
          .select(col("n").as("n_docs"),
            round(col("v1"), 6).as("v1_r"),
            round(col("v2"), 6).as("v2_r"),
            round(col("v3"), 6).as("v3_r"),
            round(col("v4"), 6).as("v4_r"),
            round(col("vt"), 6).as("v_total_r"),
            round(col("alpha"), 6).as("alpha_r"),
            (col("alpha") >= 0.7d).as("consistent"))
      }
    },
    Some(s"""
      WITH f AS (
        SELECT CAST(round(least(1.0, CAST(n_words AS DOUBLE) / 50), 4)
                 AS DECIMAL(10,4)) AS i1,
               CAST(1.0 - round(CAST(n_punct AS DOUBLE)
                 / n_chars_raw, 4) AS DECIMAL(10,4)) AS i2,
               CAST(round(CAST(n_stop AS DOUBLE) / n_words, 4)
                 AS DECIMAL(10,4)) AS i3,
               CAST(1.0 - round(CAST(n_digit AS DOUBLE)
                 / n_chars_raw, 4) AS DECIMAL(10,4)) AS i4
        FROM (
          SELECT length(text) AS n_chars_raw,
                 len(string_split(norm, ' ')) AS n_words,
                 len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                   AS n_punct,
                 len(regexp_extract_all(norm, '\\b(the|of|and|to|is|a)\\b'))
                   AS n_stop,
                 len(regexp_extract_all(text, '[0-9]')) AS n_digit
          FROM (SELECT text, ${normalizeSql("text")} AS norm
                FROM documents) raw) feats),
      agg AS (
        SELECT COUNT(*) AS n,
               SUM(i1) AS s1, SUM(i1 * i1) AS q1,
               SUM(i2) AS s2, SUM(i2 * i2) AS q2,
               SUM(i3) AS s3, SUM(i3 * i3) AS q3,
               SUM(i4) AS s4, SUM(i4 * i4) AS q4,
               SUM(i1 + i2 + i3 + i4) AS st,
               SUM((i1 + i2 + i3 + i4) * (i1 + i2 + i3 + i4)) AS qt
        FROM f),
      vars AS (
        SELECT n,
          (CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE)
            * CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS v1,
          (CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE)
            * CAST(s2 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS v2,
          (CAST(n AS DOUBLE) * CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE)
            * CAST(s3 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS v3,
          (CAST(n AS DOUBLE) * CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE)
            * CAST(s4 AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS v4,
          (CAST(n AS DOUBLE) * CAST(qt AS DOUBLE) - CAST(st AS DOUBLE)
            * CAST(st AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS vt
        FROM agg)
      SELECT n AS n_docs,
             round(v1, 6) AS v1_r, round(v2, 6) AS v2_r,
             round(v3, 6) AS v3_r, round(v4, 6) AS v4_r,
             round(vt, 6) AS v_total_r,
             CASE WHEN vt > 0 AND n > 1 THEN
               round((CAST(4.0 AS DOUBLE) / CAST(3.0 AS DOUBLE))
                 * (1.0 - (v1 + v2 + v3 + v4) / vt), 6)
             END AS alpha_r,
             CASE WHEN vt > 0 AND n > 1 THEN
               (CAST(4.0 AS DOUBLE) / CAST(3.0 AS DOUBLE))
                 * (1.0 - (v1 + v2 + v3 + v4) / vt)
             END >= CAST(0.7 AS DOUBLE) AS consistent
      FROM vars
    """))

  val all: Seq[GraftQuery] = Seq(q279)
}
