package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Eval-set decontamination — the training-data hygiene step every
  * large-scale pipeline runs before training: flag training documents
  * that share long word n-grams with a held-out evaluation set, so
  * benchmark answers can't leak into the training corpus. (The standard
  * recipe: normalized text, n-grams of 8-13 words, any collision flags
  * the training doc; e.g. Brown et al. 2020 appendix C.)
  *
  * Scale shape (the reason this beats a doc×doc similarity join): the
  * eval side is FIXED SIZE (benchmarks are thousands of docs, corpus
  * growth never touches it), so its distinct gram set stays
  * broadcastable forever; the training side is exploded to (doc_id,
  * gram) rows but those stream through the broadcast-hash join with NO
  * shuffle — only the colliding rows (a vanishing fraction) reach the
  * per-doc aggregation. No hint is used: statistics/AQE pick the
  * broadcast, and at freak eval sizes the plan degrades to a shuffle
  * join instead of a driver OOM (the q03/q04 lesson).
  */
object Decontaminate {

  /** (doc_id, gram) rows, one per n-word window position (NOT distinct). */
  private def explodedGrams(docs: DataFrame, n: Int,
      textCol: String): DataFrame = {
    require(n >= 2, "n-grams need n >= 2")
    val window = (0 until n)
      .map(j => if (j == 0) "words[i - 1]" else s"words[i + ${j - 1}]")
      .mkString(", ")
    docs
      .select(col("doc_id"), split(normalize(col(textCol)), " ").as("words"))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(1, size(words) - ${n - 1}), " +
            s"i -> concat_ws(' ', $window))")).as("gram"))
  }

  /** doc_id + distinct n-word grams over normalized text (the n-gram
    * generalization of [[MinHashDedup.shingles]], same normalization so
    * gram semantics can't drift from the dedup family's).
    */
  def ngrams(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame =
    explodedGrams(docs, n, textCol).distinct()

  /** Training docs sharing ≥ `minHits` distinct n-grams with ANY eval
    * doc: (doc_id, n_hits), ordered. The train side is deliberately NOT
    * pre-deduplicated — per-doc distinctness is settled by
    * `countDistinct` AFTER the collision join, so the only pre-join
    * shuffle in the plan is the (tiny) eval gram distinct.
    */
  def flagged(train: DataFrame, evalSet: DataFrame, n: Int = 8,
      minHits: Long = 1, textCol: String = "text"): DataFrame = {
    val evalGrams = ngrams(evalSet, n, textCol)
      .select(col("gram")).distinct()
    explodedGrams(train, n, textCol)
      .join(evalGrams, "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
      .filter(col("n_hits") >= minHits)
      .orderBy(col("doc_id"))
  }
}
