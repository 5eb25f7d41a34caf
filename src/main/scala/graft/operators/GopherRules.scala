package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** The Gopher document-quality rules (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A — the ruleset RedPajama and similar corpus builds reuse)
  * as named, composable Column predicates plus a per-document verdict.
  * [[graft.operators.TextQueries]]'s q48 scores quality continuously;
  * this is the published DECISION ruleset — each rule individually
  * reportable so a corpus audit can say which rule gated a doc, and the
  * conjunction pluggable into the q87 funnel's gate stage.
  *
  * Rules kept (of Appendix A): word count bounds, mean word length
  * bounds, alphabetic-word fraction, and minimum stop-word hits. The
  * line-shape rules (bullet/ellipsis line fractions) need line
  * structure this corpus does not have and are omitted rather than
  * stubbed.
  *
  * Scale shape: everything is ONE map-side projection — no shuffle, no
  * join, no UDF — and every stat is computed with codegen'd primitives
  * (`aggregate`/`transform` array folds are CodegenFallback and would
  * knock the projection out of whole-stage codegen — the
  * MockScorers.aspectPred lesson): the word-length sum falls out of
  * arithmetic on the single-spaced normalized string
  * (`length − (n_words − 1)`), digit-only words are counted with one
  * `regexp_count`, and the stop probes are `array_contains` calls.
  * Integer sums divided once keep every ratio cross-engine exact.
  */
object GopherRules {

  val MinWords = 50
  val MaxWords = 100000
  val MinMeanLen = 3.0
  val MaxMeanLen = 10.0
  val MinAlphaFrac = 0.8
  val MinStopHits = 2

  /** Gopher's stop-word probe list (Appendix A): a doc of natural prose
    * contains at least two DISTINCT words of this list — membership,
    * not occurrences ("the the …" hits ONE list word, not two).
    */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule columns over `docs(doc_id, text)`: stats, one
    * boolean per rule, and the conjunction verdict; ordered by doc_id.
    */
  def audit(docs: DataFrame): DataFrame = {
    val norm = normalize(col("text"))
    val w = split(norm, " ")
    val nWords = size(w)
    // normalize single-spaces and trims, so Σ word lengths is exactly
    // total length minus the n−1 separators — no array fold needed
    val meanLen = (length(norm) - (nWords - 1)).cast("double") / nWords
    // alphabetic words = words that are not digit-only; normalize's
    // alphabet is [a-z0-9], so one anchored regexp_count suffices
    // (the DuckDB oracle reaches the same VALUE via a per-word list
    // fold — RE2 lacks lookbehind, and only the values must agree)
    val digitWords =
      regexp_count(norm, lit("(^|(?<= ))[0-9]+(?= |$)")).cast("long")
    // empty text → split yields one "" word, which contains no letter:
    // the fold/oracle scores it 0, so the arithmetic form must too
    val alphaFrac = when(length(norm) === 0, 0.0d)
      .otherwise((nWords - digitWords).cast("double") / nWords)
    // distinct membership (the published rule), not occurrence count:
    // one array_contains per list word, summed — 8 codegen'd probes
    val stopHits = StopWords
      .map(sw => when(array_contains(w, sw), 1L).otherwise(0L))
      .reduce(_ + _)
    docs
      .select(col("doc_id"),
        nWords.cast("long").as("n_words"),
        round(meanLen, 6).as("mean_word_len"),
        round(alphaFrac, 6).as("alpha_frac"),
        stopHits.as("stop_hits"))
      .withColumn("ok_word_count",
        col("n_words") >= MinWords && col("n_words") <= MaxWords)
      .withColumn("ok_mean_len",
        col("mean_word_len") >= MinMeanLen &&
          col("mean_word_len") <= MaxMeanLen)
      .withColumn("ok_alpha", col("alpha_frac") >= MinAlphaFrac)
      .withColumn("ok_stop_words", col("stop_hits") >= MinStopHits)
      .withColumn("pass",
        col("ok_word_count") && col("ok_mean_len") &&
          col("ok_alpha") && col("ok_stop_words"))
      .orderBy(col("doc_id"))
  }
}
