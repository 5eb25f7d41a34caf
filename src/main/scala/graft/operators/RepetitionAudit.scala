package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.normalize

/** X183 — document repetition audit (the OTHER half of Gopher's
  * quality table, Rae et al. 2021 §A1.1: X56 ships the word-count /
  * mean-length / alpha / stop-word rules, this ships the repetition
  * signals those cannot see): per document the fraction of
  * normalized characters covered by (a) occurrences of the single
  * most frequent word BIGRAM ("top-2-gram fraction", Gopher bound
  * 0.20) and (b) all duplicated word 4-GRAMS ("dup-4-gram fraction",
  * Gopher bound 0.16) — the boilerplate/spam texture (navigation
  * chrome, keyword stuffing, copy-paste loops) that sails through
  * every per-word rule.
  *
  * Definitions stated precisely (Gopher's prose leaves them loose):
  * char mass of a gram = occurrences × length(gram text incl. its
  * separators); the dup-4 numerator sums that mass over grams with
  * count ≥ 2, so overlapping occurrences can exceed the text length
  * — the ratio is CAPPED at 1.0 (documented; the cap only binds on
  * degenerate loop-texts, which the rule rejects anyway). Fractions
  * are ONE double division each from exact long char counts; empty
  * or sub-n-gram docs score 0 by construction (no divide-by-zero).
  *
  * Scale shape: one scan → per-doc gram arrays built IN the row
  * (transform over the split — no positional self-join), one explode
  * to the (doc, gram) census (map-side combined, bounded by corpus
  * token count), a per-doc top-1 window on that frame, and a per-doc
  * conditional sum. Everything after the explode is gram-frame
  * arithmetic — the same economics as the X44/X94 token census.
  */
object RepetitionAudit {

  val Top2Bound = 0.20
  val Dup4Bound = 0.16

  /** Per-doc repetition profile over a (doc_id, text) frame. */
  def audit(documents: DataFrame): DataFrame = {
    val docs = documents.select(col("doc_id"),
      normalize(col("text")).as("norm"))
      .withColumn("l", split(col("norm"), " "))
      .withColumn("n_words",
        when(col("norm") === "", 0L).otherwise(size(col("l")).cast("long")))
      .withColumn("n_chars", length(col("norm")).cast("long"))
    def grams(n: Int): DataFrame = docs
      .withColumn("gram", explode(when(size(col("l")) >= n,
        expr(s"transform(sequence(1, size(l) - ${n - 1}), i -> " +
          (1 to n).map(j => s"element_at(l, i + ${j - 1})")
            .mkString("concat_ws(' ', ", ", ", ")") + ")"))
        .otherwise(array().cast("array<string>"))))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .withColumn("glen", length(col("gram")).cast("long"))
    val top2 = grams(2)
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("c").desc, col("gram"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("gram").as("top2_gram"),
        (col("c") * col("glen")).as("top2_chars"))
    val dup4 = grams(4).filter(col("c") >= 2)
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("glen")).as("dup4_chars"))
    docs.select(col("doc_id"), col("n_words"), col("n_chars"))
      .join(top2, Seq("doc_id"), "left")
      .join(dup4, Seq("doc_id"), "left")
      .withColumn("top2_frac",
        when(col("n_chars") > 0, least(lit(1.0d),
          coalesce(col("top2_chars"), lit(0L)).cast("double") /
            col("n_chars").cast("double"))).otherwise(0.0d))
      .withColumn("dup4_frac",
        when(col("n_chars") > 0, least(lit(1.0d),
          coalesce(col("dup4_chars"), lit(0L)).cast("double") /
            col("n_chars").cast("double"))).otherwise(0.0d))
      .withColumn("ok_top2", col("top2_frac") <= Top2Bound)
      .withColumn("ok_dup4", col("dup4_frac") <= Dup4Bound)
      .withColumn("pass", col("ok_top2") && col("ok_dup4"))
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        col("top2_gram"), col("top2_frac"), col("dup4_frac"),
        col("ok_top2"), col("ok_dup4"), col("pass"))
      .orderBy(col("doc_id"))
  }

  /** q220 — the repetition audit over documents. */
  val q220 = GraftQuery(
    "q220_repetition_audit",
    (s, d) => audit(t(s, d, "documents")),
    Some {
      val norm = graft.functions.MockScorers.normalizeSql("text")
      s"""
      WITH docs AS (
        SELECT doc_id, $norm AS norm, string_split($norm, ' ') AS l
        FROM documents),
      base AS (
        SELECT doc_id,
               CASE WHEN norm = '' THEN 0 ELSE len(l) END AS n_words,
               length(norm) AS n_chars, l
        FROM docs),
      g2 AS (
        SELECT doc_id, gram, COUNT(*) AS c, length(gram) AS glen
        FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(l)),
            i -> l[i] || ' ' || l[i+1])) AS gram
          FROM base)
        GROUP BY doc_id, gram),
      top2 AS (
        SELECT doc_id, gram AS top2_gram, c * glen AS top2_chars
        FROM (
          SELECT doc_id, gram, c, glen,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY c DESC, gram) AS rk
          FROM g2)
        WHERE rk = 1),
      g4 AS (
        SELECT doc_id, gram, COUNT(*) AS c, length(gram) AS glen
        FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(l) - 2),
            i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
            l[i+3])) AS gram
          FROM base)
        GROUP BY doc_id, gram),
      dup4 AS (
        SELECT doc_id, CAST(SUM(c * glen) AS BIGINT) AS dup4_chars
        FROM g4 WHERE c >= 2 GROUP BY doc_id)
      SELECT b.doc_id, b.n_words, b.n_chars, t.top2_gram,
             CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(t.top2_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END AS top2_frac,
             CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(d.dup4_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END AS dup4_frac,
             CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(t.top2_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END
               <= $Top2Bound AS ok_top2,
             CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(d.dup4_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END
               <= $Dup4Bound AS ok_dup4,
             (CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(t.top2_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END
               <= $Top2Bound) AND
             (CASE WHEN b.n_chars > 0 THEN LEAST(1.0,
               CAST(COALESCE(d.dup4_chars, 0) AS DOUBLE) /
                 CAST(b.n_chars AS DOUBLE)) ELSE 0.0 END
               <= $Dup4Bound) AS pass
      FROM base b
      LEFT JOIN top2 t ON t.doc_id = b.doc_id
      LEFT JOIN dup4 d ON d.doc_id = b.doc_id
      ORDER BY b.doc_id
    """
    })

  val all: Seq[GraftQuery] = Seq(q220)
}
