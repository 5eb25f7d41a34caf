package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Checkpoints.EagerCheckpoint
import graft.functions.MockScorers.normalize

/** Importance resampling for training-data selection — the DSIR shape
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every raw document by how much
  * more likely its n-gram bag is under a TARGET corpus model than under
  * the raw-corpus model,
  *
  *   logw(doc) = Σ_f k_f(doc) · ( ln p_target(f) − ln p_raw(f) ),
  *
  * then draw a fixed-size sample ∝ w via Gumbel-top-k. Both models are
  * Laplace-smoothed bigram counts, so the model IS a DataFrame (the
  * [[BigramLm]] argument: swapping in a model trained elsewhere changes
  * no plan).
  *
  * Determinism discipline: the per-feature log-ratio is computed as ONE
  * double division of two integer-exact products followed by one `ln`
  * (identical op order in Spark and the DuckDB oracle), each term is
  * rounded to 6 places and summed in DECIMAL(20,6) — order-insensitive,
  * so `logw_r` itself is hash-checkable, not just the ordering (the
  * q46/q83 discipline). The Gumbel key reuses q73's mirrorable LCG
  * uniform; it orders the sample but is never output.
  *
  * Scale shape (three shuffles, none carrying text): per-(doc, bigram)
  * counts with map-side combine; the two models aggregated FROM that
  * frame (bytes ∝ distinct doc-bigrams); models joined back on bigram —
  * a trained target model is vocabulary-bounded, so AQE broadcasts it.
  * The 1-row totals frame broadcasts off Catalyst's maxRows=1 estimate,
  * and the Gumbel-top-k compiles to TakeOrderedAndProject (per-partition
  * heaps, no global sort). At 100 TB the integer products inside the ratio can
  * pass 2^53 — a production deployment subtracts logs instead; the
  * product form is kept here because it makes the oracle integer-exact.
  */
object ImportanceResampling {

  /** Gumbel-top-`k` resample of `docs(doc_id, lang, text)` toward the
    * rows where `isTarget`: returns the selected (doc_id, lang,
    * n_bigrams, logw_r) ordered by doc_id.
    */
  def resample(docs: DataFrame, isTarget: Column, k: Int): DataFrame = {
    // materialized once (q87's discipline): four consumers below —
    // rawModel, tgtModel, totals, and the scoring join — would each
    // re-run the corpus explode + aggregate otherwise (AQE's exchange
    // reuse only recovered 2 of the 4, measured on the executed plan)
    val byDoc = docs
      .select(col("doc_id"), col("lang"),
        split(normalize(col("text")), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), size(col("words")) - 1)).as("i"),
        col("words"))
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", element_at(col("words"), col("i")),
          element_at(col("words"), col("i") + 1)).as("bigram"))
      .groupBy(col("doc_id"), col("lang"), col("bigram"))
      .agg(count(lit(1)).as("k"))
      .eagerCheckpoint()

    val rawModel = byDoc.groupBy(col("bigram")).agg(sum(col("k")).as("n_raw"))
    val tgtModel = byDoc.filter(isTarget)
      .groupBy(col("bigram")).agg(sum(col("k")).as("n_tgt"))

    // 1-row totals frame: raw/target instance masses and the smoothing
    // vocabulary (distinct bigrams anywhere in the raw pool)
    val totals = byDoc
      .agg(sum(col("k")).as("t_raw"),
        sum(when(isTarget, col("k")).otherwise(0L)).as("t_tgt"))
      .crossJoin(rawModel.agg(count(lit(1)).as("v")))

    // ((n_tgt+1)(t_raw+v)) / ((n_raw+1)(t_tgt+v)) — integer-exact
    // products, one division, one ln: the op sequence the oracle mirrors
    val ratio =
      ((col("n_tgt") + 1) * (col("t_raw") + col("v"))).cast("double") /
        ((col("n_raw") + 1) * (col("t_tgt") + col("v"))).cast("double")
    val scored = byDoc
      .join(rawModel, "bigram")
      .join(tgtModel, Seq("bigram"), "left")
      .na.fill(0L, Seq("n_tgt"))
      // no broadcast hint: a grouping-key-free aggregate has maxRows = 1,
      // so Catalyst's size estimate broadcasts it unhinted at any SF
      // (an explicit hint here would trip PlanSpec's guard against
      // hints whose lineage contains an SF-scaling scan — correctly:
      // the guard can't see cardinality, only provenance)
      .crossJoin(totals)
      .withColumn("term", round(col("k") * log(ratio), 6))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("term").cast(DecimalType(20, 6))).cast("double").as("logw_r"))

    // Gumbel-top-k: priority = logw + G, G = −ln(−ln u) with q73's
    // mirrorable LCG uniform — sampling ∝ w, retry-stable. Spark's pmod
    // is always non-negative while SQL % follows the dividend's sign,
    // so the q101 oracle mirrors pmod explicitly as
    // ((x % m + m) % m) — identical for ANY doc_id sign, no
    // non-negativity precondition to enforce at runtime
    val u = (pmod(col("doc_id") * 1103515245L + 12345L, lit(1000000L)) + 1)
      .cast("double") / 1000001.0
    scored
      .withColumn("priority", col("logw_r") - log(-log(u)))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("logw_r"))
      .orderBy(col("doc_id"))
  }
}
