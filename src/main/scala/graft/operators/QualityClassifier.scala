package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Hashed linear quality classifier — the learned-filter tier of a
  * pretraining curation stack (GPT-3, Brown et al. 2020 §A: a
  * logistic-regression quality classifier over hashed text features
  * decides which CommonCrawl documents enter the corpus; LLaMA and
  * CCNet use the same shape via fastText). Sits between the
  * hand-written rule tier ([[GopherRules]], q103) and the LM-scoring
  * tier ([[BigramLm]] / q106): cheap enough to run corpus-wide, but a
  * LEARNED decision boundary instead of thresholds.
  *
  * The model here is the feature-hashing trick (Weinberger et al.
  * ICML 2009) over unigrams: bucket = h(word) mod B, margin =
  * Σ w[bucket(token)] / (1000·n_tokens), keep = margin ≥ 0. The
  * weight vector is a FROZEN deterministic stand-in — w[b] =
  * LCG(b) ∈ [−1000, 1000] — following the repo's frozen-mock-model
  * precedent (SURVEY §7.4: the reference's own retrain loop mocks its
  * model the same way); a trained coefficient vector drops in without
  * touching the plan. The engine surface being exercised is real:
  * per-token feature hashing in a codegen'd projection, a map-side-
  * combinable (doc_id) sum — token rows shuffle as (id, long), text
  * never moves — and an integer-exact margin (weights and counts are
  * longs; ONE IEEE division at the end, the Q.scala determinism rule),
  * so the DuckDB oracle hash-matches bit-for-bit. The keep decision
  * compares the UNROUNDED integer sum against zero — deciding on the
  * rounded margin would flip sign for tiny negative sums that round to
  * −0.0.
  *
  * The word hash is q50's mirrorable per-word hash (length·17 +
  * ascii(first)·31 + ascii(last)) — one hash definition for
  * fingerprinting and feature hashing, so the two cannot drift.
  *
  * No reference counterpart (the reference scores sentiment, not
  * corpus quality — SURVEY §2.8 extension, X62).
  */
object QualityClassifier {

  /** Feature buckets. 2^12 keeps the toy weight table regenerable in
    * SQL; production fastText uses 2M — only this constant changes.
    */
  val Buckets = 4096L

  /** q50's per-word hash, bucketed: always non-negative, so `pmod`
    * and SQL `%` agree without the sign-safe double-mod.
    */
  def wordBucket(w: Column): Column =
    pmod(length(w).cast("long") * 17L + ascii(w).cast("long") * 31L +
      ascii(reverse(w)).cast("long"), lit(Buckets))

  /** Frozen LCG weight for a bucket: integer in [−1000, 1000]. */
  def bucketWeight(b: Column): Column =
    pmod(b * 1103515245L + 12345L, lit(2001L)) - lit(1000L)

  /** Per-document disposition: (doc_id, n_tokens, margin, keep). */
  def score(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    // margin to 6 dp derived in exact INTEGER micro-units: round(x, 6)
    // on the double quotient diverges between engines on half-boundary
    // rows (Spark rounds the shortest-decimal rendering via
    // BigDecimal.valueOf, DuckDB the exact binary value — a 1-ulp trap
    // that hit one sf0.1 row), while ⌊(2·10⁶|s|/10³·? ... )⌋ —
    // half-away-from-zero as one integer division — is engine-free:
    // micros = sign(s) · ⌊(2·1000·|s| + n) / (2n)⌋, margin = micros/1e6.
    docs
      .select(col(id), explode(split(normalize(col(text)), " ")).as("w"))
      .select(col(id), bucketWeight(wordBucket(col("w"))).as("wgt"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wgt")).as("s"))
      // `div` is exact integer division (the SQL operator); everything
      // up to the final /1e6 stays in longs
      .withColumn("__mu0",
        expr("(abs(s) * 2000 + n_tokens) div (2 * n_tokens)"))
      .withColumn("__mu",
        when(col("s") < 0L, -col("__mu0")).otherwise(col("__mu0")))
      .select(col(id), col("n_tokens"),
        (col("__mu").cast("double") / 1000000.0d).as("margin"),
        (col("s") >= 0L).as("keep"))
  }
}
