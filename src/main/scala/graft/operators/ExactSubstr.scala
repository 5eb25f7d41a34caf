package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Checkpoints.EagerCheckpoint
import graft.functions.MockScorers.normalize
import graft.functions.expressions.WinnowSelect

/** Exact-substring deduplication (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better", the ExactSubstr tool):
  * any word run of length ≥ minRun that occurs more than once
  * corpus-wide — across documents OR repeated within one — is
  * duplicated text; [[dupSpanStats]] reports each document's maximal
  * duplicated regions and [[dedup]] performs the paper's removal,
  * cutting every occurrence except the globally first.
  *
  * The paper builds a corpus-wide suffix array; the Spark-first
  * re-expression is gram-positional: hash EVERY minRun-word gram (the
  * [[graft.functions.expressions.WinnowSelect]] kernel at window w=1 —
  * winnowing at selection density 1 is exactly the every-position gram
  * stream, and the skey encoding hash·2^21 + (2^21−1−pos) carries the
  * position along for free), count occurrences per gram, and merge each
  * document's duplicated gram positions into maximal token intervals
  * with a gaps-and-islands pass: successive duplicated positions p,
  * p' chain into one region iff p' − p ≤ minRun (their [p, p+minRun−1]
  * token intervals overlap or touch), so a region's token span is
  * [min p, max p + minRun − 1] and distinct regions are disjoint by
  * construction. A run of length m ≥ minRun duplicated elsewhere yields
  * m − minRun + 1 duplicated gram positions, each gap 1 — one island
  * spanning exactly the run.
  *
  * Scale shape: the gram stream is (doc_id, pos, fp) longs at density
  * 1 per word — the method's irreducible cost, the same O(corpus
  * tokens) the paper's suffix array pays, and 3 longs/word is ~5× the
  * text's own bytes but never the text itself. Occurrence counting is
  * one fp-keyed agg (map-side partial collapses recurring grams);
  * the join back re-shuffles the stream once on fp; the islands window
  * shuffles only DUPLICATED positions on doc_id (∝ duplicated text,
  * ≪ corpus). [[dedup]] adds one fp-keyed min (the survivor pick) and
  * q102's rewrite contract: the removed-interval sets join to the
  * tokenized corpus in the single text-carrying exchange, and the
  * per-doc slice is an `array_except` index complement, O(words +
  * removed) — text is never taken apart into shuffled rows.
  *
  * Hash note: fp is the q50/q104 polynomial mod 1e9+7, replayed
  * bit-for-bit by the DuckDB oracle (same per-word values, same fold),
  * so both engines see identical gram classes, collisions included. A
  * collision can only over-mark (a false duplicated gram), the
  * conservative direction for a removal tool; production would widen to
  * a 128-bit digest at the cost of an oracle that can no longer rebuild
  * hashes in SQL.
  */
object ExactSubstr {

  /** Every-position gram stream (doc_id, pos, fp) plus the tokenized
    * corpus it came from: one scan, one kernel evaluation
    * (pre-explode checkpoint, q104's discipline), text stays in
    * `parsed`.
    */
  private def gramStream(docs: DataFrame, minRun: Int)
      : (DataFrame, DataFrame) = {
    val parsed = docs
      .select(col("doc_id"), split(normalize(col("text")), " ").as("words"))
      .eagerCheckpoint()
    val grams = parsed
      .select(col("doc_id"),
        WinnowSelect(col("words"), minRun, 1).as("skeys"))
      .eagerCheckpoint()
      .select(col("doc_id"), explode(col("skeys")).as("skey"))
      .select(col("doc_id"),
        shiftright(col("skey"), Winnowing.PosBits).as("fp"),
        (lit(Winnowing.PosMask) -
          col("skey").bitwiseAND(lit(Winnowing.PosMask))).as("pos"))
    (parsed, grams)
  }

  /** Duplicated gram positions with per-gram occurrence counts:
    * (doc_id, pos, fp) where fp occurs ≥ 2 times corpus-wide.
    */
  private def dupPositions(grams: DataFrame): DataFrame = {
    val occ = grams.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    grams.join(occ, "fp").filter(col("n_occ") >= 2)
      .select(col("doc_id"), col("pos"), col("fp"))
  }

  /** Gaps-and-islands labeling over duplicated positions: break when
    * the gap between successive positions in a doc exceeds minRun
    * (their token intervals no longer overlap or touch).
    */
  private def withIslands(dup: DataFrame, minRun: Int): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byPos) > minRun, 1)
          .otherwise(0))
      .withColumn("island", sum(col("brk")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-document maximal duplicated-span stats (q107): n_words,
    * n_spans, dup_tokens (union coverage), max_span, frac_dup. Every
    * input doc appears; span-free docs report zeros.
    */
  def dupSpanStats(docs: DataFrame, minRun: Int): DataFrame = {
    val (parsed, grams) = gramStream(docs, minRun)
    val perDoc = withIslands(dupPositions(grams), minRun)
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("st"),
        (max(col("pos")) + lit(minRun.toLong) - 1L).as("en"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("en") - col("st") + 1L).as("dup_tokens"),
        max(col("en") - col("st") + 1L).as("max_span"))
    parsed
      .select(col("doc_id"), size(col("words")).cast("long").as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("max_span"), lit(0L)).as("max_span"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_words"), 6).as("frac_dup"))
      .orderBy(col("doc_id"))
  }

  /** The paper's removal (q108): every duplicated region is cut from
    * every document EXCEPT the region holding the corpus-first
    * occurrence. Survivor rule, deterministic on both engines: each
    * duplicated gram's survivor is its occurrence with minimal
    * doc_id·2^21 + pos (one BIGINT min — first doc, then first
    * position); a region survives iff it contains at least one
    * survivor gram. A verbatim copy of an earlier document therefore
    * loses every region while the original keeps all of its own.
    *
    * Output per input doc: (doc_id, clean_text, n_words, n_removed),
    * clean_text the surviving words rejoined in order ('' when fully
    * duplicated), n_removed the tokens cut.
    */
  def dedup(docs: DataFrame, minRun: Int): DataFrame = {
    val (parsed, grams) = gramStream(docs, minRun)
    val dup = dupPositions(grams)
    val surv = dup
      .groupBy(col("fp"))
      .agg(min(col("doc_id") * lit(Winnowing.PosMod) + col("pos")).as("sk"))
    val flagged = dup.join(surv, "fp")
      .withColumn("is_surv",
        (col("doc_id") * lit(Winnowing.PosMod) + col("pos") === col("sk"))
          .cast("int"))
    val removedPerDoc = withIslands(flagged, minRun)
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("st"),
        (max(col("pos")) + lit(minRun.toLong) - 1L).as("en"),
        max(col("is_surv")).as("keep"))
      .filter(col("keep") === 0)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("st"), col("en"))).as("rm"))
    parsed
      .join(removedPerDoc, Seq("doc_id"), "left")
      .withColumn("removed_idx",
        coalesce(
          flatten(transform(col("rm"),
            s => sequence(s("st"), s("en")))),
          array().cast("array<long>")))
      .withColumn("kept_idx",
        array_except(
          sequence(lit(0L), size(col("words")).cast("long") - 1L),
          col("removed_idx")))
      .select(col("doc_id"),
        array_join(transform(col("kept_idx"),
          i => element_at(col("words"), (i + 1L).cast("int"))), " ")
          .as("clean_text"),
        size(col("words")).cast("long").as("n_words"),
        size(col("removed_idx")).cast("long").as("n_removed"))
      .orderBy(col("doc_id"))
  }
}
