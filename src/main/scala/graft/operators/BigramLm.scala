package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Count-based bigram language-model scoring — the shape of CCNet-style
  * importance filtering (score each document against an LM, keep the
  * head of the distribution), with the LM reduced to corpus bigram
  * counts so every number is integer-exact and oracle-checkable. A real
  * deployment swaps the count table for one trained on a reference
  * corpus; the plan is identical because the model IS a DataFrame.
  *
  * Outputs per doc: total bigram instances, the summed corpus frequency
  * of those instances (high = the doc speaks like the corpus), and the
  * count of corpus-unique instances (high = noise/hapax-heavy). The
  * head/middle/tail bucketing decision is a downstream filter on these.
  *
  * Scale shape, three shuffles, none carrying text beyond bigrams:
  *   1. per-(doc, bigram) counts — map-side partial agg collapses
  *      within-doc repeats before anything moves;
  *   2. the model: bigram → global count, aggregated FROM step 1's
  *      output (bytes ∝ distinct doc-bigrams, not instances);
  *   3. model joined back on bigram — AQE broadcasts the model when a
  *      trained (bounded-vocab) model replaces the self-scored one, and
  *      handles the hot-bigram skew otherwise.
  */
object BigramLm {

  /** Per-document bigram-LM stats over `docs(doc_id, text)`, docs with
    * ≥ 2 words only: (doc_id, n_bigrams, sum_freq, n_unique) ordered by
    * doc_id. `sum_freq` = Σ corpus-count over instances; `n_unique` =
    * instances whose bigram occurs nowhere else in the corpus.
    */
  def scores(docs: DataFrame): DataFrame = {
    val byDoc = docs
      .select(col("doc_id"), split(normalize(col("text")), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("words")) - 1)).as("i"),
        col("words"))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("words"), col("i")),
          element_at(col("words"), col("i") + 1)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("k"))
    val model = byDoc.groupBy(col("bigram"))
      .agg(sum(col("k")).as("n_occ"))
    byDoc.join(model, "bigram")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(col("k") * col("n_occ")).as("sum_freq"),
        sum(when(col("n_occ") === 1, col("k")).otherwise(0L)).as("n_unique"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2020 §4.3)
    * over `docs(doc_id, text, lang)`: rank each document within its
    * LANGUAGE by familiarity (mean corpus frequency of its bigrams,
    * high ≈ low perplexity) and ntile(3)-split the ranking. The window
    * orders on the UNROUNDED ratio (one IEEE division, bit-identical
    * cross-engine) with doc_id as total tiebreak so the cut is
    * deterministic; only the REPORTED familiarity is rounded. Output:
    * (doc_id, lang, familiarity, bucket) ordered by doc_id.
    *
    * Scale shape: [[scores]]'s three shuffles build the stats; the
    * bucketing adds one hash exchange on lang + a per-partition sort,
    * all on (doc_id, lang, longs) rows — text never reaches the window
    * (plan-walked in PplBucketsSpec). A dominant language makes its
    * partition's SORT the bound (spillable O(n log n)), not a shuffle.
    */
  def buckets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = scores(docs.select(col("doc_id"), col("text")))
    val w = Window.partitionBy(col("lang"))
      .orderBy((col("sum_freq").cast("double") / col("n_bigrams")).desc,
        col("doc_id"))
    stats
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .withColumn("bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          ntile(3).over(w)))
      .select(col("doc_id"), col("lang"),
        round(col("sum_freq").cast("double") / col("n_bigrams"), 4)
          .as("familiarity"),
        col("bucket"))
      .orderBy(col("doc_id"))
  }
}
