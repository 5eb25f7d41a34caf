package graft.operators

import org.apache.spark.sql.functions._

import Q._

/** X112 — ranking-quality metrics (nDCG@k, MRR, recall@k, precision@k;
  * Järvelin & Kekäläinen TOIS'02 for DCG): the evaluation harness the
  * retrieval tier (BM25 q133/q157, the ANN ladder) is tuned against —
  * a retrieval stack without its metrics operator cannot tell whether
  * an index change helped.
  *
  * Relevance here is DERIVED deterministically from the corpus (a doc
  * is relevant iff it contains ≥ 2 DISTINCT probe terms), so the
  * metric query needs no external judgment file and stays
  * oracle-checkable; with a real label table the join below is
  * unchanged.
  *
  * Determinism: ranks come from q133's deterministic ranking; each
  * rank's gain 1/log2(rank+1) is computed by the same expression tree
  * both engines (ln on small exact integers — the q133/q134 ln
  * precedent); the DCG sum is a FIXED-ORDER sum over the k rank
  * columns (rank order, not partition order), and the ideal DCG
  * derives from the total relevant count R by the same closed form on
  * both sides.
  */
object RankingMetrics {

  /** q158 — metrics of the q133 BM25 ranking against the derived
    * relevance set.
    */
  val q158 = GraftQuery(
    "q158_ranking_metrics", {
      (s, d) => {
        val k = Bm25.TopK
        // relevance: >= 2 distinct probe terms present
        val rel = t(s, d, "documents")
          .select(col("doc_id"),
            Bm25.Terms.map(tm =>
              when(array_contains(split(col("text"), " "), tm), 1)
                .otherwise(0)).reduce(_ + _).as("nterms"))
          .select(col("doc_id"), (col("nterms") >= 2).as("relevant"))
        val ranked = Bm25.q133.build(s, d)
          .join(rel, Seq("doc_id"), "left")
          .withColumn("rel", coalesce(col("relevant"), lit(false)))
          .withColumn("gain", when(col("rel"),
            lit(1.0d) / log2(col("rank").cast("double") + 1.0d))
            .otherwise(lit(0.0d)))
        // fixed-order folds over the k rank columns
        def atRank(r: Int, c: String) =
          coalesce(max(when(col("rank") === r, col(c))), lit(0.0d))
        val agg = ranked.agg(
          (1 to k).map(r => atRank(r, "gain").as(s"g$r")).head,
          (1 to k).map(r => atRank(r, "gain").as(s"g$r")).tail ++ Seq(
            sum(when(col("rel"), 1L).otherwise(0L)).as("hits"),
            min(when(col("rel"), col("rank"))).as("first_rel")): _*)
        val totals = rel.agg(
          sum(when(col("relevant"), 1L).otherwise(0L)).as("n_relevant"))
        val dcg = (1 to k).map(r => col(s"g$r")).reduce(_ + _)
        // ideal DCG: the first min(R, k) ranks all relevant — same
        // closed form both engines (expression tree over n_relevant)
        val idcg = (1 to k).map(r =>
          when(lit(r) <= least(col("n_relevant"), lit(k.toLong)),
            lit(1.0d) / log2(lit(r.toDouble) + 1.0d)).otherwise(lit(0.0d)))
          .reduce(_ + _)
        agg.join(broadcast(totals))
          .withColumn("dcg", dcg)
          .withColumn("idcg", idcg)
          .select(
            col("n_relevant"), col("hits").as(s"hits_at_$k"),
            // degenerate empty-relevance case guarded on BOTH engines:
            // ANSI Spark errors on x/0 where DuckDB yields inf/nan
            round(when(col("n_relevant") === 0L, 0.0d)
              .otherwise(col("hits").cast("double") /
                col("n_relevant").cast("double")), 6).as("recall_r"),
            round(col("hits").cast("double") / k, 6).as("precision_r"),
            round(when(col("first_rel").isNull, 0.0d)
              .otherwise(lit(1.0d) / col("first_rel").cast("double")), 6)
              .as("mrr_r"),
            round(when(col("n_relevant") === 0L, 0.0d)
              .otherwise(col("dcg") / col("idcg")), 6).as("ndcg_r"))
      }
    },
    Some(s"""
      WITH ranked0 AS (${Bm25.q133.oracle.get.trim.stripSuffix(
        "ORDER BY rank").trim}
      ),
      rel AS (
        SELECT doc_id,
               (${Bm25.Terms.map(tm =>
                 s"CASE WHEN list_contains(string_split(text, ' '), '$tm') THEN 1 ELSE 0 END")
                 .mkString(" + ")}) >= 2 AS relevant
        FROM documents),
      scored AS (
        SELECT r.rank,
               coalesce(rel.relevant, false) AS rel,
               CASE WHEN coalesce(rel.relevant, false)
                 THEN 1.0 / log2(CAST(r.rank AS DOUBLE) + 1.0)
                 ELSE 0.0 END AS gain
        FROM ranked0 r LEFT JOIN rel ON r.doc_id = rel.doc_id),
      agg AS (
        SELECT ${(1 to Bm25.TopK).map(r =>
          s"coalesce(max(CASE WHEN rank = $r THEN gain END), 0.0) AS g$r")
          .mkString(", ")},
               sum(CASE WHEN rel THEN 1 ELSE 0 END) AS hits,
               min(CASE WHEN rel THEN rank END) AS first_rel
        FROM scored),
      totals AS (
        SELECT sum(CASE WHEN relevant THEN 1 ELSE 0 END) AS n_relevant
        FROM rel)
      SELECT CAST(n_relevant AS BIGINT) AS n_relevant,
             CAST(hits AS BIGINT) AS hits_at_${Bm25.TopK},
             round(CASE WHEN n_relevant = 0 THEN 0.0
               ELSE CAST(hits AS DOUBLE) / CAST(n_relevant AS DOUBLE) END, 6)
               AS recall_r,
             round(CAST(hits AS DOUBLE) / ${Bm25.TopK}, 6) AS precision_r,
             round(CASE WHEN first_rel IS NULL THEN 0.0
               ELSE 1.0 / CAST(first_rel AS DOUBLE) END, 6) AS mrr_r,
             round(CASE WHEN n_relevant = 0 THEN 0.0 ELSE
               (${(1 to Bm25.TopK).map(r => s"g$r").mkString(" + ")}) /
               (${(1 to Bm25.TopK).map(r =>
                 s"CASE WHEN $r <= least(n_relevant, ${Bm25.TopK}) " +
                   s"THEN 1.0 / log2($r + 1.0) ELSE 0.0 END")
                 .mkString(" + ")}) END, 6) AS ndcg_r
      FROM agg, totals
    """))

  val all: Seq[GraftQuery] = Seq(q158)
}
