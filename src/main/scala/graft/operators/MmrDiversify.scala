package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X85 — Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
  * SIGIR'98): greedily re-rank a retrieval shortlist so each pick
  * balances relevance to the query against redundancy with what is
  * already picked — mmr(c) = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s).
  * The per-QUERY diversification face of the engine's corpus-level
  * pruning tiers (X53 SemDeDup / X63 D4 prune the corpus once; MMR
  * diversifies each result list at query time — RAG context assembly
  * being the modern consumer: k near-identical retrieved chunks waste
  * k−1 context slots).
  *
  * Determinism: every cosine comes from the q45 fused fold (bit-
  * identical cross-engine); the greedy argmax at each step orders by
  * the UNROUNDED (mmr desc, vec_id); the redundancy term is a MAX —
  * order-independent, no float-sum hazard; λ-arithmetic is one
  * identical expression tree. The greedy loop is UNROLLED (fixed K
  * picks), so the oracle is a CTE chain — the q114/q128
  * fixed-iteration discipline.
  *
  * Scale shape: the corpus-sized work is exactly one q45-shaped scan
  * producing the per-query shortlist (or an ANN tier's shortlist —
  * q55/q127 feed the same frame); the MMR loop itself touches only
  * |shortlist|² pair sims per query — planning-frame sized (10² here),
  * never corpus-sized. Selected-set frames are 1-row-per-pick joins,
  * nothing collected to the driver.
  */
object MmrDiversify {

  /** Relevance/redundancy trade-off. */
  val Lambda = 0.7

  /** Shortlist size fed to MMR. */
  val Shortlist = 10

  /** Picks. */
  val K = 4

  /** MMR-select K from the query's top-[[Shortlist]] cosine candidates.
    * Output: (sel_rank, vec_id, mmr_r) — mmr_r is the score AT
    * SELECTION TIME (rank 1's is its raw relevance).
    */
  def diversified(embeddings: DataFrame, queryId: Long): DataFrame = {
    val dot = graft.functions.expressions.VectorFunctions.dot _
    val sqn = graft.functions.expressions.VectorFunctions.sqNorm _
    val e = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(sqn(col("emb"))))
    val q = e.filter(col("vec_id") === queryId)
      .select(col("emb").as("qemb"), col("nrm").as("qnrm"))
    // r19 optimization: `cand` (corpus relevance scan → top-Shortlist)
    // is consumed by BOTH pairSim sides, the rank-1 pick, and every
    // greedy step's anti-join; `pairSim` by every step. Un-materialized,
    // each of the K unioned picks embedded the full corpus-scan subtree
    // again (the embeddings table was scanned once per consumer).
    // Checkpointing the ≤Shortlist-row candidate frame and the
    // ≤Shortlist²-row pair frame makes the corpus scan run ONCE.
    val cand = graft.Checkpoints.eager(e.filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .withColumn("rel", dot(col("qemb"), col("emb")) /
        (col("qnrm") * col("nrm")))
      .orderBy(col("rel").desc, col("vec_id")).limit(Shortlist)
      .select(col("vec_id"), col("rel"), col("emb"), col("nrm")))
    val a = cand.select(col("vec_id").as("i"), col("emb").as("ea"),
      col("nrm").as("na"))
    val b = cand.select(col("vec_id").as("j"), col("emb").as("eb"),
      col("nrm").as("nb"))
    val pairSim = graft.Checkpoints.eager(a.join(b, col("i") =!= col("j"))
      .withColumn("sim", dot(col("ea"), col("eb")) / (col("na") * col("nb")))
      .select(col("i"), col("j"), col("sim")))

    var sel = cand.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), lit(1).as("sel_rank"), col("rel").as("mmr"))
    var selIds = sel.select(col("vec_id"))
    for (k <- 2 to K) {
      val rem = cand.join(selIds, Seq("vec_id"), "left_anti")
      val red = pairSim
        .join(selIds.withColumnRenamed("vec_id", "j"), "j")
        .groupBy(col("i")).agg(max(col("sim")).as("maxsim"))
        .withColumnRenamed("i", "vec_id")
      val pick = rem.join(red, "vec_id")
        .withColumn("mmr",
          lit(Lambda) * col("rel") - lit(1.0 - Lambda) * col("maxsim"))
        .orderBy(col("mmr").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), lit(k).as("sel_rank"), col("mmr"))
      sel = sel.unionByName(pick)
      selIds = sel.select(col("vec_id"))
    }
    sel.select(col("sel_rank"), col("vec_id"), round(col("mmr"), 6).as("mmr_r"))
      .orderBy(col("sel_rank"))
  }

  /** q136 — MMR for query vec_id 0 on the embeddings corpus. */
  val q136 = GraftQuery(
    "q136_mmr_diversify",
    (s, d) => diversified(t(s, d, "embeddings"), 0L),
    Some {
      // unrolled greedy CTE chain; cosine by the identical fold
      def stepCte(k: Int): String = s"""
      sel$k AS (
        SELECT vec_id, $k AS sel_rank, mmr FROM (
          SELECT c.vec_id,
                 $Lambda * c.rel - ${1.0 - Lambda} * max(p.sim) AS mmr
          FROM cand c
          JOIN pairsim p ON p.i = c.vec_id
          JOIN selected${k - 1} s ON p.j = s.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM selected${k - 1})
          GROUP BY c.vec_id, c.rel)
        ORDER BY mmr DESC, vec_id LIMIT 1),
      selected$k AS (
        SELECT vec_id, sel_rank, mmr FROM selected${k - 1}
        UNION ALL SELECT vec_id, sel_rank, mmr FROM sel$k)"""
      s"""
      WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding::DOUBLE[], x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings),
      q AS (SELECT emb AS qemb, nrm AS qnrm FROM e WHERE vec_id = 0),
      cand AS (
        SELECT e.vec_id,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(q.qemb, (x, i) -> x * e.emb[i])),
                 (acc, v) -> acc + v) / (q.qnrm * e.nrm) AS rel,
               e.emb, e.nrm
        FROM e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, e.vec_id LIMIT $Shortlist),
      pairsim AS (
        SELECT a.vec_id AS i, b.vec_id AS j,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(a.emb, (x, k) -> x * b.emb[k])),
                 (acc, v) -> acc + v) / (a.nrm * b.nrm) AS sim
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
      selected1 AS (
        SELECT vec_id, 1 AS sel_rank, rel AS mmr FROM cand
        ORDER BY rel DESC, vec_id LIMIT 1),
      ${(2 to K).map(stepCte).mkString(",")}
      SELECT CAST(sel_rank AS INTEGER) AS sel_rank, vec_id,
             round(mmr, 6) AS mmr_r
      FROM selected$K
      ORDER BY sel_rank
    """
    })

  val all: Seq[GraftQuery] = Seq(q136)
}
