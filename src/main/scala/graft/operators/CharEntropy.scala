package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X83 — character-entropy gibberish gate: per-document Shannon
  * entropy over the character distribution, flagging the two
  * quality-failure tails a crawl exhibits — near-zero entropy
  * (repeated-character runs, padding, ASCII-art borders) and
  * anomalously high entropy (base64/hex blobs, minified or encrypted
  * payloads masquerading as text). The standard cheap companion to the
  * model-based gates (CCNet buckets by LM perplexity — X58; raw
  * compressors by ratio — X30; entropy is the closed-form member of
  * that family, one pass, no model).
  *
  * Determinism: H = ln(L) − (Σ_c n_c·ln n_c)/L with the sum folded
  * over the SORTED distinct-char count array — counts are exact
  * integers, equal counts are interchangeable terms, so the ascending
  * sort gives both engines the identical float op order (the q45
  * fold discipline applied to an aggregation: a groupBy float sum
  * would be partition-order-dependent). ln is evaluated on
  * exact-integer arguments only; identical expression tree →
  * bit-identical doubles → the comparisons and the rounded report
  * agree cross-engine.
  *
  * Scale shape: one explode to (doc_id, char) → map-side-combined
  * count agg → per-doc collect of the ≤|alphabet| count array (the
  * alphabet is bounded — ~100 distinct chars for web text — so the
  * array is a small fixed cost per doc, NOT corpus-growth-sized);
  * everything downstream is per-row arithmetic. No window, no second
  * corpus shuffle.
  */
object CharEntropy {

  /** Quarantine thresholds (nats): below Low = repetition/padding,
    * above High = encoded-blob territory for natural text.
    */
  val Low = 1.5
  val High = 4.5

  /** q134 — per-doc char entropy + tail flags, full corpus. */
  val q134 = GraftQuery(
    "q134_char_entropy_gate", {
      (s, d) => {
        val chars = t(s, d, "documents")
          .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
        val counts = chars.groupBy(col("doc_id"), col("ch"))
          .agg(count(lit(1)).as("n"))
        val perDoc = counts.groupBy(col("doc_id"))
          .agg(sum(col("n")).as("len"),
            array_sort(collect_list(col("n"))).as("cnts"))
          .withColumn("sumnlogn", aggregate(col("cnts"), lit(0.0d),
            (acc, n) => acc + n.cast("double") * log(n.cast("double"))))
          .withColumn("entropy", log(col("len").cast("double")) -
            col("sumnlogn") / col("len").cast("double"))
        perDoc
          .select(col("doc_id"), col("len").as("n_chars_counted"),
            size(col("cnts")).as("n_distinct_chars"),
            round(col("entropy"), 6).as("entropy_r"),
            (col("entropy") < Low).as("too_uniform"),
            (col("entropy") > High).as("too_random"))
          .orderBy(col("doc_id"))
      }
    },
    Some(s"""
      WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents),
      chars2 AS (SELECT doc_id, ch FROM chars WHERE ch <> ''),
      counts AS (
        SELECT doc_id, ch, count(*) AS n FROM chars2 GROUP BY 1, 2),
      perdoc AS (
        SELECT doc_id, sum(n) AS len,
               list_sort(list(n)) AS cnts
        FROM counts GROUP BY 1),
      scored AS (
        SELECT doc_id, len, len(cnts) AS n_distinct_chars,
               ln(CAST(len AS DOUBLE)) -
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(cnts,
                   n -> CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)))),
                 (acc, v) -> acc + v) / CAST(len AS DOUBLE) AS entropy
        FROM perdoc)
      SELECT doc_id, CAST(len AS BIGINT) AS n_chars_counted,
             CAST(n_distinct_chars AS INTEGER) AS n_distinct_chars,
             round(entropy, 6) AS entropy_r,
             entropy < $Low AS too_uniform,
             entropy > $High AS too_random
      FROM scored
      ORDER BY doc_id
    """))

  val all: Seq[GraftQuery] = Seq(q134)
}
