package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Q._

/** X81 — hard-negative triplet mining for contrastive training: for
  * each anchor vector, the nearest SAME-label neighbor (the positive)
  * and the top-k nearest DIFFERENT-label neighbors (the hard
  * negatives — the near-boundary examples that carry the gradient
  * signal; random negatives are trivially separable and teach nothing).
  * This is the retrieval-training data-prep step behind DPR/Contriever-
  * style dual encoders (Karpukhin et al. EMNLP'20 mine hard negatives
  * from BM25/ANN; Xiong et al. ICLR'21 "ANCE" from the index itself) —
  * the training-set FACE of the engine's ANN ladder.
  *
  * Determinism: the q45 discipline exactly — cosine via the fused
  * sequential-fold dot product (bit-identical to DuckDB's
  * list_reduce), ranking on the UNROUNDED (cosine desc, vec_id) pair,
  * only reported scores rounded to 6 dp.
  *
  * Scale shape: one corpus scan; the anchor set is the only broadcast
  * (bounded query frame, the q45 pattern); positives and negatives are
  * two windows over the SAME scored frame partitioned by anchor — no
  * second join back to the corpus. At self-supervised scale (anchors =
  * corpus) the scored frame comes from an ANN shortlist (q55 IVF /
  * q127 PQ feed the same window shape) instead of the exact cross
  * product; the label split itself adds nothing to the shuffle.
  */
object HardNegatives {

  /** Hard negatives per anchor. */
  val NegK = 3

  /** q132 — (anchor, positive, hard-negative) triplet rows for anchors
    * vec_id < 10: 3 rows per anchor (one per negative rank), the
    * positive repeated — the flat shape a training-data writer shards
    * on, and the shape the hash oracle can check without array
    * ordering pitfalls.
    */
  val q132 = GraftQuery(
    "q132_hard_negative_triplets", {
      (s, d) => {
        val dot = graft.functions.expressions.VectorFunctions.dot _
        val sqn = graft.functions.expressions.VectorFunctions.sqNorm _
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            col("embedding").cast("array<double>").as("emb"))
          .withColumn("nrm", sqrt(sqn(col("emb"))))
        val a = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("anchor_id"), col("label").as("albl"),
            col("emb").as("aemb"), col("nrm").as("anrm"))
        val scored = e.join(broadcast(a), col("vec_id") =!= col("anchor_id"))
          .withColumn("cosine", dot(col("aemb"), col("emb")) /
            (col("anrm") * col("nrm")))
        val wA = Window.partitionBy(col("anchor_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        val pos = scored.filter(col("label") === col("albl"))
          .withColumn("rk", row_number().over(wA))
          .filter(col("rk") === 1)
          .select(col("anchor_id"), col("vec_id").as("pos_id"),
            round(col("cosine"), 6).as("pos_cos_r"))
        val neg = scored.filter(col("label") =!= col("albl"))
          .withColumn("neg_rank", row_number().over(wA))
          .filter(col("neg_rank") <= NegK)
          .select(col("anchor_id"), col("neg_rank"),
            col("vec_id").as("neg_id"), round(col("cosine"), 6).as("neg_cos_r"))
        neg.join(pos, "anchor_id")
          .select(col("anchor_id"), col("pos_id"), col("pos_cos_r"),
            col("neg_rank"), col("neg_id"), col("neg_cos_r"))
          .orderBy(col("anchor_id"), col("neg_rank"))
      }
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(embedding::DOUBLE[], x -> x * x)),
                 (acc, v) -> acc + v)) AS nrm
        FROM embeddings),
      a AS (SELECT vec_id AS anchor_id, label AS albl, emb AS aemb,
                   nrm AS anrm
            FROM e WHERE vec_id < 10),
      scored AS (
        SELECT a.anchor_id, a.albl, e.vec_id, e.label,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(a.aemb, (x, i) -> x * e.emb[i])),
                 (acc, v) -> acc + v) / (a.anrm * e.nrm) AS cosine
        FROM e CROSS JOIN a
        WHERE e.vec_id <> a.anchor_id),
      pos AS (
        SELECT anchor_id, vec_id AS pos_id, round(cosine, 6) AS pos_cos_r
        FROM (SELECT anchor_id, vec_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY anchor_id
                       ORDER BY cosine DESC, vec_id) AS rk
              FROM scored WHERE label = albl)
        WHERE rk = 1),
      neg AS (
        SELECT anchor_id, CAST(neg_rank AS INTEGER) AS neg_rank,
               vec_id AS neg_id, round(cosine, 6) AS neg_cos_r
        FROM (SELECT anchor_id, vec_id, cosine,
                     ROW_NUMBER() OVER (PARTITION BY anchor_id
                       ORDER BY cosine DESC, vec_id) AS neg_rank
              FROM scored WHERE label <> albl)
        WHERE neg_rank <= $NegK)
      SELECT n.anchor_id, p.pos_id, p.pos_cos_r, n.neg_rank, n.neg_id,
             n.neg_cos_r
      FROM neg n JOIN pos p USING (anchor_id)
      ORDER BY n.anchor_id, n.neg_rank
    """))

  val all: Seq[GraftQuery] = Seq(q132)
}
