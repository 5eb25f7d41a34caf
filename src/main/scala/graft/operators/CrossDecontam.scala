package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Q._

/** X84 — cross-corpus NEAR-duplicate decontamination: exact shingle
  * Jaccard between a train split and a held-out eval split, flagging
  * every (train, eval) pair over threshold. X29's exact n-gram
  * containment catches verbatim leakage; this is the fuzzy face — an
  * eval item paraphrased or lightly edited into the train set shares
  * most of its shingle set without containing any long verbatim run
  * (the contamination mode the GPT-3 appendix-C and PaLM audits
  * measure with n-gram OVERLAP ratios rather than exact substrings).
  *
  * Semantics: J(A, B) = |A∩B| / |A∪B| over distinct normalized
  * 3-gram shingles ([[MinHashDedup.shingles]] — ONE shingle
  * definition engine-wide), pairs restricted to train × eval (the
  * deterministic doc_id % 10 split), J ≥ τ reported with the q42
  * 4-dp rounding.
  *
  * Scale shape: the q42 inverted-index discipline cross-frame — the
  * equi-join key is the shingle (digest at scale), so candidate mass
  * is Σ_s df_train(s)·df_eval(s), bounded by the EVAL side (eval
  * benchmarks are thousands of docs; the train side is the 100 TB
  * one) — the small side's df is the multiplier, not the corpus. The
  * X61 rarity-prefix dispatch applies unchanged when eval-side df is
  * skewed; sizes frames are doc-count-sized; nothing corpus-sized is
  * broadcast.
  */
object CrossDecontam {

  /** Jaccard threshold for a contamination flag. */
  val Tau = 0.5

  /** Exact cross-corpus Jaccard pairs ≥ tau between two doc frames
    * (doc_id, text). Column names keep the split roles explicit.
    */
  def contaminatedPairs(train: DataFrame, evalDocs: DataFrame,
      tau: Double = Tau): DataFrame = {
    val shTrain = MinHashDedup.shingles(train)
    val shEval = MinHashDedup.shingles(evalDocs)
    val szTrain = shTrain.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
    val szEval = shEval.groupBy(col("doc_id")).agg(count(lit(1)).as("n_b"))
    val inter = shTrain.select(col("doc_id").as("train_doc"), col("shingle"))
      .join(shEval.select(col("doc_id").as("eval_doc"), col("shingle")),
        "shingle")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(szTrain.withColumnRenamed("doc_id", "train_doc"), "train_doc")
      .join(szEval.withColumnRenamed("doc_id", "eval_doc"), "eval_doc")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= tau)
      .select(col("train_doc"), col("eval_doc"), col("n_inter"),
        col("jaccard"))
  }

  /** q135 — contamination audit on the deterministic split: eval =
    * doc_id % 10 == 0, train = the rest (the corpus carries planted
    * near-dup families across that boundary, so the probe has real
    * positives to find).
    */
  val q135 = GraftQuery(
    "q135_cross_decontam", {
      (s, d) => {
        val docs = t(s, d, "documents")
        contaminatedPairs(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0))
          .orderBy(col("train_doc"), col("eval_doc"))
      }
    },
    Some(s"""
      WITH ${DedupQueries.shingleCtesSql},
      tr AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 10 <> 0),
      ev AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % 10 = 0),
      sz_tr AS (SELECT doc_id, count(*) AS n_a FROM tr GROUP BY 1),
      sz_ev AS (SELECT doc_id, count(*) AS n_b FROM ev GROUP BY 1),
      inter AS (
        SELECT tr.doc_id AS train_doc, ev.doc_id AS eval_doc,
               count(*) AS n_inter
        FROM tr JOIN ev USING (shingle)
        GROUP BY 1, 2),
      scored AS (
        SELECT i.train_doc, i.eval_doc, i.n_inter,
               round(CAST(i.n_inter AS DOUBLE) /
                 (a.n_a + b.n_b - i.n_inter), 4) AS jaccard
        FROM inter i
        JOIN sz_tr a ON a.doc_id = i.train_doc
        JOIN sz_ev b ON b.doc_id = i.eval_doc)
      SELECT train_doc, eval_doc, n_inter, jaccard
      FROM scored
      WHERE jaccard >= $Tau
      ORDER BY train_doc, eval_doc
    """))

  val all: Seq[GraftQuery] = Seq(q135)
}
