package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X205 — token burstiness census (Church & Gale 1995's Poisson-
  * mixture observation; Katz 1996's within-document burstiness):
  * for the corpus's head tokens, collection frequency cf, document
  * frequency df, and burstiness b = cf/df — the mean repeat count
  * inside documents that use the token at all. The lexical-class
  * gauge the flat counts (q18) and TF-IDF weights (q94) both skim
  * past: FUNCTION words spread thin (b ≈ cf-proportional but low),
  * CONTENT/topical words clump (high b at moderate df) — and a
  * pipeline uses it to pick stopword lists (X53's boilerplate cut),
  * spot template spam (anomalously bursty heads), and sanity-check
  * tokenizer changes (b is invariant to corpus growth; cf is not).
  *
  * Also emitted per token: max single-document count (the burst
  * peak) and doc coverage df/N — one fixed double division each,
  * exact long leaves. Head = top [[TopTokens]] by (cf, token) under
  * a total order (ties broken lexically, the q56 discipline).
  * Tokenization = q91's raw whitespace split (stated — burstiness of
  * the RAW stream; compose with X24's normalize for the cleaned
  * view).
  *
  * Scale shape: one token explode → ONE (token, doc) map-side-
  * combined groupBy (the df/cf/max leaves in a single pass) → one
  * |vocab|-frame groupBy → a top-k window on the |vocab| frame.
  * Scan-bound; no shuffle carries text beyond the token column.
  */
object TokenBurstiness {

  val TopTokens = 200

  /** q239 — head-token burstiness census. */
  val q239 = GraftQuery(
    "q239_token_burstiness", {
      (s, d) => {
        val docs = t(s, d, "documents")
        val total = docs.agg(count(lit(1)).as("n_docs"))
        val perDoc = docs
          .select(col("doc_id"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok"), col("doc_id"))
          .agg(count(lit(1)).as("c"))
        val vocab = perDoc.groupBy(col("tok"))
          .agg(sum(col("c")).as("cf"), count(lit(1)).as("df"),
            max(col("c")).as("max_in_doc"))
        // top-k via orderBy+limit (Spark's distributed TakeOrdered —
        // no single-partition window ever sees the full |vocab|
        // frame); the rank column is then a window over 200 rows
        vocab.orderBy(col("cf").desc, col("tok")).limit(TopTokens)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cf").desc, col("tok"))))
          .join(broadcast(total))
          .select(col("rk"), col("tok"), col("cf"), col("df"),
            col("max_in_doc"),
            (col("cf").cast("double") / col("df").cast("double"))
              .as("burstiness"),
            (col("df").cast("double") / col("n_docs").cast("double"))
              .as("coverage"))
          .orderBy(col("rk"))
      }
    },
    Some(s"""
      WITH per_doc AS (
        SELECT tok, doc_id, COUNT(*) AS c
        FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
        WHERE tok <> ''
        GROUP BY 1, 2),
      vocab AS (
        SELECT tok, CAST(SUM(c) AS BIGINT) AS cf, COUNT(*) AS df,
               CAST(MAX(c) AS BIGINT) AS max_in_doc
        FROM per_doc GROUP BY 1),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY cf DESC, tok) AS rk
        FROM vocab),
      total AS (SELECT COUNT(*) AS n_docs FROM documents)
      SELECT CAST(rk AS INTEGER) AS rk, tok, cf, df, max_in_doc,
             CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness,
             CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE) AS coverage
      FROM ranked CROSS JOIN total
      WHERE rk <= $TopTokens
      ORDER BY rk
    """))

  val all: Seq[GraftQuery] = Seq(q239)
}
