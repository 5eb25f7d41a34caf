package graft.operators

import org.apache.spark.sql.functions._

import Q._
import graft.functions.MockScorers.{normalize, normalizeSql}

/** X132 — reciprocal-rank fusion (Cormack, Clarke & Buettcher SIGIR'09):
  * the standard zero-training rank aggregator — each ranker votes
  * 1/(k + rank) and the scores add, so a document high on ANY list
  * surfaces while outlier rankers can't veto (k=60 damps the head,
  * the paper's constant). Two first-class uses in this engine: fusing
  * multi-retriever candidate lists (X92 BM25 + X76 ANN in a RAG
  * stack), and — the form here — a CONSENSUS curation ranking across
  * independent quality signals, the multi-signal generalization of
  * X30's keep-best.
  *
  * Signals (each from the one document scan, q48's recipes): token
  * count, mean word length, alpha density. Ranks are global
  * row_numbers with doc_id tiebreaks over the |docs| frame, computed
  * with q149's two-level range-bucket prefix swap
  * ([[RankSum.bucketedRowNumber]], r19 — VERDICT r18 item 1): bucket
  * counts + a ≤1025-row offsets frame + a bucket-PARTITIONED
  * row_number, so no single-partition window touches the corpus
  * frame (PlanSpec-gated); the fusion itself is a per-row expression.
  *
  * Determinism: ranks are exact integers; the RRF sum is a FIXED-ORDER
  * three-term tree of 1/(60+r) divisions (signal set is
  * data-independent — the q95 fixed-order-pivot rule), so both engines
  * produce identical doubles; top-50 ties broken by doc_id.
  */
object RankFusion {

  /** RRF damping constant (Cormack et al.'s k). */
  val K = 60

  /** Fused rules kept. */
  val TopDocs = 50

  /** q174 — RRF consensus ranking of documents over three signals. */
  val q174 = GraftQuery(
    "q174_rank_fusion", {
      (s, d) => {
        // eager-checkpointed: the signal projection is regexp-heavy
        // scan-side compute with NO exchange in its lineage, and the
        // three rank swaps each read it from span/offsets/main
        // branches — without the materialization every branch would
        // re-run the scan projection (r19, measured 6× at sf0.1)
        val sig = graft.Checkpoints.eager(t(s, d, "documents")
          .select(col("doc_id"), col("text"),
            normalize(col("text")).as("norm"))
          .select(col("doc_id"),
            size(split(col("norm"), " ")).as("n_words"),
            (length(regexp_replace(col("norm"), " ", "")).cast("double") /
              size(split(col("norm"), " ")).cast("double"))
              .as("word_len"),
            (regexp_count(col("text"), lit("[a-zA-Z]")).cast("double") /
              length(col("text")).cast("double")).as("alpha_ratio")))
        // negated signal = ascending bucket key along the DESC order;
        // all three ranks share one flat span/bucket pass
        val r3 = RankSum.bucketedRowNumbers(sig, Seq(
          RankSum.RankSpec(-col("n_words").cast("double"), "rn_w",
            Seq(col("n_words").desc, col("doc_id"))),
          RankSum.RankSpec(-col("word_len"), "rn_l",
            Seq(col("word_len").desc, col("doc_id"))),
          RankSum.RankSpec(-col("alpha_ratio"), "rn_a",
            Seq(col("alpha_ratio").desc, col("doc_id")))),
          withTotal = false)
        val ranked = r3
          .withColumn("r_words", col("rn_w").cast("int"))
          .withColumn("r_wordlen", col("rn_l").cast("int"))
          .withColumn("r_alpha", col("rn_a").cast("int"))
          .drop("rn_w", "rn_l", "rn_a")
        val term = (r: String) =>
          lit(1.0) / (lit(K) + col(r)).cast("double")
        ranked
          .select(col("doc_id"), col("n_words"),
            col("r_words"), col("r_wordlen"), col("r_alpha"),
            ((term("r_words") + term("r_wordlen")) + term("r_alpha"))
              .as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id"))
          .limit(TopDocs)
      }
    },
    Some(s"""
      WITH sig AS (
        SELECT doc_id,
               CAST(len(string_split(${normalizeSql("text")}, ' '))
                 AS INTEGER) AS n_words,
               CAST(len(replace(${normalizeSql("text")}, ' ', ''))
                   AS DOUBLE)
                 / CAST(len(string_split(${normalizeSql("text")}, ' '))
                   AS DOUBLE) AS word_len,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS DOUBLE)
                 / CAST(len(text) AS DOUBLE) AS alpha_ratio
        FROM documents),
      ranked AS (
        SELECT doc_id, n_words,
               CAST(row_number() OVER (ORDER BY n_words DESC, doc_id)
                 AS INTEGER) AS r_words,
               CAST(row_number() OVER (ORDER BY word_len DESC, doc_id)
                 AS INTEGER) AS r_wordlen,
               CAST(row_number() OVER (ORDER BY alpha_ratio DESC, doc_id)
                 AS INTEGER) AS r_alpha
        FROM sig)
      SELECT doc_id, n_words, r_words, r_wordlen, r_alpha,
             ((1.0 / CAST($K + r_words AS DOUBLE)
               + 1.0 / CAST($K + r_wordlen AS DOUBLE))
               + 1.0 / CAST($K + r_alpha AS DOUBLE)) AS rrf_score
      FROM ranked
      ORDER BY rrf_score DESC, doc_id
      LIMIT $TopDocs
    """))

  val all: Seq[GraftQuery] = Seq(q174)
}
