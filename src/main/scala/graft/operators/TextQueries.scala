package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** Text-analysis operators for a training-data pipeline (north-star X18):
  * language-ID heuristic, quality scoring, token counting, and document
  * fingerprinting. All pure Column expressions (codegen'd, no UDF) with
  * exact DuckDB mirrors.
  */
object TextQueries {

  /** Language-ID by stopword-marker counting ([[TextFeatures]] — shared
    * with q62's pipeline so the definitions cannot drift), reported as a
    * confusion matrix against the metadata lang column. Deterministic
    * priority tiebreak en > es > de > fr > und.
    */
  val q47 = GraftQuery(
    "q47_langid_confusion",
    (s, d) =>
      TextFeatures.withLangScores(
        t(s, d, "documents")
          .select(col("doc_id"), col("lang"),
            normalize(col("text")).as("norm")), col("norm"))
        .withColumn("predicted", TextFeatures.predicted)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted")),
    Some(s"""
      WITH scored AS (
        SELECT doc_id, lang,
               ${TextFeatures.langScoresSql(normalizeSql("text"))}
        FROM documents),
      pred AS (
        SELECT lang,
               ${TextFeatures.predictedSql} AS predicted
        FROM scored)
      SELECT lang, predicted, COUNT(*) AS n
      FROM pred
      GROUP BY 1, 2
      ORDER BY lang, predicted
    """))

  /** Quality scoring: length/word/punctuation/stopword features and a
    * composite score. Single double divisions only (deterministic).
    */
  val q48 = GraftQuery(
    "q48_quality_score",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("text"), normalize(col("text")).as("norm"))
        .withColumn("n_chars_raw", length(col("text")))
        .withColumn("n_words", size(split(col("norm"), " ")))
        .withColumn("avg_word_len",
          round(length(regexp_replace(col("norm"), " ", ""))
            .cast("double") / col("n_words"), 4))
        .withColumn("punct_ratio",
          round(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))
            .cast("double") / col("n_chars_raw"), 4))
        .withColumn("stopword_ratio",
          round(regexp_count(col("norm"), lit("\\b(the|of|and|to|is|a)\\b"))
            .cast("double") / col("n_words"), 4))
        .withColumn("quality",
          TextFeatures.quality(col("n_words"), col("punct_ratio")))
        .select(col("doc_id"), col("n_chars_raw"), col("n_words"),
          col("avg_word_len"), col("punct_ratio"), col("stopword_ratio"),
          col("quality"))
        .orderBy(col("doc_id")),
    Some(s"""
      WITH f AS (
        SELECT doc_id, text, ${normalizeSql("text")} AS norm
        FROM documents),
      feats AS (
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS n_chars_raw,
               CAST(len(string_split(norm, ' ')) AS INTEGER) AS n_words,
               CAST(length(replace(norm, ' ', '')) AS INTEGER) AS n_letters,
               CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS INTEGER) AS n_punct,
               CAST(len(regexp_extract_all(norm, '\\b(the|of|and|to|is|a)\\b')) AS INTEGER) AS n_stop
        FROM f)
      SELECT doc_id, n_chars_raw, n_words,
             round(CAST(n_letters AS DOUBLE) / n_words, 4) AS avg_word_len,
             round(CAST(n_punct AS DOUBLE) / n_chars_raw, 4) AS punct_ratio,
             round(CAST(n_stop AS DOUBLE) / n_words, 4) AS stopword_ratio,
             ${TextFeatures.qualitySql("n_words",
               "round(CAST(n_punct AS DOUBLE) / n_chars_raw, 4)")} AS quality
      FROM feats
      ORDER BY doc_id
    """))

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  val q49 = GraftQuery(
    "q49_token_counts",
    (s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(split(normalize(col("text")), " ")).as("ws_tokens"),
          regexp_count(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).as("bpe_tokens"),
          length(col("text")).as("n_chars_raw"))
        .withColumn("chars_per_token",
          round(col("n_chars_raw").cast("double") / col("bpe_tokens"), 4))
        .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id,
             CAST(len(string_split(${normalizeSql("text")}, ' ')) AS INTEGER) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS bpe_tokens,
             CAST(length(text) AS INTEGER) AS n_chars_raw,
             round(CAST(length(text) AS DOUBLE) /
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')), 4) AS chars_per_token
      FROM documents
      ORDER BY doc_id
    """))

  /** Document fingerprint: polynomial rolling hash over per-word integer
    * values, exact sequential fold in both engines (native
    * [[graft.functions.expressions.WordFingerprint]] loop vs DuckDB
    * `list_reduce` over a 0-prepended list), all mod 1e9+7. The
    * composable `aggregate(transform(...))` form it replaces was a
    * CodegenFallback higher-order chain.
    */
  val q50 = GraftQuery(
    "q50_fingerprint",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), split(normalize(col("text")), " ").as("words"))
        .withColumn("fingerprint",
          graft.functions.expressions.WordFingerprint(col("words")))
        .groupBy(col("fingerprint"))
        .agg(min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("fingerprint")),
    Some(s"""
      WITH fp AS (
        SELECT doc_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(${normalizeSql("text")}, ' '),
                   w -> CAST(length(w) * 17 + ascii(w) * 31
                             + ascii(reverse(w)) AS BIGINT))),
                 (acc, v) -> (acc * 31 + v) % 1000000007) AS fingerprint
        FROM documents)
      SELECT fingerprint, MIN(doc_id) AS survivor_id, COUNT(*) AS n_docs
      FROM fp
      GROUP BY 1
      ORDER BY fingerprint
    """))

  /** Multimodal column plumbing (X17): text payload as an opaque binary
    * column with typed metadata (byte length + sha256 digest) — the
    * schema/partitioning pattern for image/audio payloads; the decode stub
    * lives in graft.operators.Multimodal.
    */
  val q51 = GraftQuery(
    "q51_multimodal_metadata",
    (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          col("source"))
        .select(
          col("doc_id"), col("source"),
          octet_length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("digest"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id, source,
             CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             sha256(text) AS digest
      FROM documents
      ORDER BY doc_id
    """))

  val all: Seq[GraftQuery] = Seq(q47, q48, q49, q50, q51)
}
