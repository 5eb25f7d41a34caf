package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Domain mixture rebalancing — deciding how much of each source
  * (web crawl, books, code, …) goes into a token budget, then sampling
  * to those rates. The mixture TABLE is the artifact a training run
  * records; the sampler materializes it.
  *
  * Scale shape: the plan is one aggregation over (source) — token
  * counts reuse q49's whitespace definition — producing a frame with
  * one row per source (dozens, not millions), so the sampler's
  * rate-join broadcasts trivially and the keep-decision is a
  * deterministic per-row hash threshold: no shuffle beyond the one
  * mixture aggregation, and re-running yields the same sample
  * (retry-stable, like q30/q73 — never `rand()`).
  */
object DomainMix {

  /** Per-source corpus mass: (source, n_docs, tok_mass). */
  def mixture(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("source"),
        size(split(normalize(col(textCol)), " ")).cast("long").as("tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tok_mass"))

  /** Sampling plan for EQUAL shares of `tokenBudget` across sources:
    * rate_s = min(1, (budget / n_sources) / tok_mass_s). Oversubscribed
    * sources downsample; undersized ones keep everything (their deficit
    * is a data-acquisition problem, not a sampling one).
    */
  def planEqualShares(docs: DataFrame, tokenBudget: Long,
      textCol: String = "text"): DataFrame = {
    val mix = mixture(docs, textCol)
    // unpartitioned window is safe HERE: it runs over the post-agg
    // mixture frame (one row per source — dozens), never the corpus,
    // and reuses the single corpus aggregation
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    mix
      .withColumn("rate", round(least(lit(1.0),
        lit(tokenBudget.toDouble) / count(lit(1)).over(w) /
          col("tok_mass")), 6))
      .select(col("source"), col("n_docs"), col("tok_mass"), col("rate"))
      .orderBy(col("source"))
  }

  /** Deterministic rate-sampling against a (source, rate) plan: keep a
    * doc iff hash(doc_id) mod 1e6 < rate·1e6 — the same retry-stable
    * discipline as q30 (a nondeterministic `rand()` here would resample
    * under fetch-failure recomputation and corrupt the mixture).
    */
  def sample(docs: DataFrame, plan: DataFrame): DataFrame =
    docs.join(plan.select(col("source"), col("rate")), "source")
      .filter(pmod(xxhash64(col("doc_id")), lit(1000000L)) <
        (col("rate") * 1000000L).cast("long"))
      .drop("rate")

  /** Oracle-mirrorable variant of plan+sample in one integer-threshold
    * step, for compositions that need a cross-engine-exact keep
    * decision (q87). The per-source threshold is
    * `min(1e6, floor(1e6 · budget / n_sources / tok_mass))` — kept in
    * INTEGER space end to end (a float `rate` would truncate in Spark's
    * long cast but round in DuckDB's, an off-by-one on the keep
    * boundary) — and the uniform is the mirrorable LCG shared with
    * q30/q63/q84, not xxhash64 (which DuckDB lacks). Same scale shape
    * as [[sample]]: one tiny-plan broadcast join, per-row filter.
    */
  /** `hintBroadcastPlan`: broadcast the (source, keep_thresh) plan at
    * PLANNING time, size-gated on [[graft.Limits.BroadcastRows]] (an
    * eager count — callers that set this are already eager). Without
    * the hint, AQE's runtime SMJ→BHJ conversion still executes the
    * probe-side shuffle it replaces, which moves every doc's text —
    * the exchange the q87 funnel structurally forbids.
    */
  def sampleThresholds(docs: DataFrame, tokenBudget: Long,
      textCol: String = "text", hintBroadcastPlan: Boolean = false)
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val plan0 = mixture(docs, textCol)
      .withColumn("keep_thresh", least(lit(1000000L),
        floor(lit(1000000.0) * tokenBudget / count(lit(1)).over(w) /
          col("tok_mass"))))
      .select(col("source"), col("keep_thresh"))
    // materialize before gating so count() + join don't each re-run the
    // mixture aggregation (the plan frame is one row per source — KBs)
    val plan = if (hintBroadcastPlan) graft.Checkpoints.eager(plan0) else plan0
    val planHinted =
      if (hintBroadcastPlan && plan.count() <= graft.Limits.BroadcastRows)
        broadcast(plan) else plan
    docs.join(planHinted, "source")
      .filter(pmod(col("doc_id") * 1103515245L + 12345L, lit(1000000L)) <
        col("keep_thresh"))
      .drop("keep_thresh")
  }
}
