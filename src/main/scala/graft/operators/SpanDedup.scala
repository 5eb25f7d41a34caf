package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Checkpoints.EagerCheckpoint
import graft.functions.MockScorers.normalize

/** Sub-document (span-level) deduplication: documents that are NOT
  * near-duplicates as wholes still share verbatim runs — boilerplate
  * headers, quoted passages, templated blocks. Whole-doc dedup (q40-q44)
  * never sees them; span dedup finds the repeated runs themselves so a
  * pipeline can cut the span and keep the document.
  *
  * Block definition: normalize → whitespace words → consecutive
  * NON-overlapping `blockWords`-word blocks (tail shorter than a full
  * block is ignored). A block instance is duplicated when its content
  * occurs more than once corpus-wide (within- or cross-document).
  *
  * Scale shape (the reason this is exactly one extra shuffle over a
  * token count):
  *   - blocks are reduced to 16-byte md5 digests BEFORE the occurrence
  *     count, so the shuffle carries digests, never text — q40's
  *     discipline at sub-document granularity;
  *   - non-overlapping blocks keep the exploded row count at
  *     tokens/blockWords (a 20× reduction vs sliding windows; the
  *     sliding variant is q77's decontamination join, where recall over
  *     a SMALL eval set justifies the density);
  *   - the digest→count aggregation partially aggregates map-side, so
  *     bytes ∝ distinct blocks, and the count join back to instances is
  *     a self-equi-join on the digest, AQE-handled if block frequency
  *     skews (the empty-string block of templated corpora).
  */
object SpanDedup {

  /** Per-document duplicated-span stats over `docs(doc_id, text)`:
    * (doc_id, n_blocks, n_dup_blocks, dup_tokens) for every doc with at
    * least one full block, ordered by doc_id. `dup_tokens` =
    * blockWords × n_dup_blocks — the token mass a span-cut would remove.
    */
  /** Raw block instances over `docs(doc_id, text)`: one row per
    * consecutive non-overlapping `blockWords`-word block, as
    * (doc_id, bi, block text) with `bi` the 0-based block position —
    * the position makes order-preserving reassembly
    * ([[removeBoilerplate]]) possible. The shared kernel of
    * [[dupBlockStats]], the bloom pre-filter ([[BloomDedup]]), and the
    * boilerplate rewrite — one block definition, so the exact and
    * sketched paths cannot drift.
    */
  def blocks(docs: DataFrame, blockWords: Int): DataFrame =
    blocksFromWords(
      docs.select(col("doc_id"),
        split(normalize(col("text")), " ").as("words")),
      blockWords)

  /** [[blocks]] over an already-tokenized `(doc_id, words)` frame — the
    * seam that lets [[removeBoilerplate]] tokenize the corpus exactly
    * once and derive every downstream frame from the same scan.
    */
  private def blocksFromWords(parsed: DataFrame,
      blockWords: Int): DataFrame =
    parsed
      .select(col("doc_id"), col("words"))
      .filter(size(col("words")) >= blockWords)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor(size(col("words")) / blockWords).cast("int") - 1)).as("bi"),
        col("words"))
      .select(col("doc_id"), col("bi"),
        concat_ws(" ",
          slice(col("words"), col("bi") * blockWords + 1, lit(blockWords)))
          .as("block"))

  /** Boilerplate REMOVAL — the rewrite face of [[dupBlockStats]]'s
    * detection, the C4/CCNet line-dedup step re-expressed on the shared
    * block unit: a block is boilerplate when its content occurs in at
    * least `minDocs` DISTINCT documents (doc frequency, not occurrence
    * count — a phrase repeated inside ONE document is repetition, q69's
    * concern, not boilerplate). Every boilerplate block instance is cut
    * and each document's surviving blocks plus its sub-block tail are
    * reassembled in original order.
    *
    * Output per input doc: (doc_id, clean_text, n_blocks, n_removed),
    * docs shorter than one block pass through untouched.
    *
    * Scale shape — TEXT CROSSES EXACTLY ONE EXCHANGE (PlanSpec-walked,
    * q87's contract): the corpus is tokenized once (`parsed` eagerly
    * materialized, q87's discipline — the naive three-branch form
    * executed 3 FileScans with zero exchange reuse), the candidate path
    * runs entirely on (doc_id, bi, digest) triples — doc frequency,
    * the ≥ minDocs filter, and the per-doc removed-position collection
    * shuffle 16-byte digests and int positions, never a block string —
    * and the rewrite itself derives the kept block positions as
    * `array_except(all positions, removed positions)` — a hash-set
    * complement, O(blocks + removed) per doc (a per-word
    * `array_contains` scan would be O(words × removed), a per-doc
    * quadratic face on boilerplate-heavy docs) — then slices the
    * original words array per kept position, tail (positions ≥
    * nb·blockWords) always appended. The one text-carrying exchange is
    * the join that brings the removed-position sets to the words —
    * co-locating corpus text with a globally-derived per-doc verdict
    * cannot cost less. No collect_list of text, no sort: the document
    * is never taken apart into shuffled block strings.
    */
  def removeBoilerplate(docs: DataFrame, blockWords: Int,
      minDocs: Int): DataFrame = {
    val parsed = docs
      .select(col("doc_id"), split(normalize(col("text")), " ").as("words"))
      .withColumn("nb",
        greatest(floor(size(col("words")) / blockWords).cast("int"), lit(0)))
      .eagerCheckpoint()
    // digest-only instance stream: (doc_id, bi, bh) — text stays put
    val instIds = blocksFromWords(parsed, blockWords)
      .select(col("doc_id"), col("bi"), md5(col("block")).as("bh"))
    val docFreq = instIds.select(col("bh"), col("doc_id")).distinct()
      .groupBy(col("bh")).agg(count(lit(1)).as("n_docs"))
    val removedPerDoc = instIds.join(docFreq, "bh")
      .filter(col("n_docs") >= minDocs)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("bi")).as("removed_bis"))
    parsed
      .join(removedPerDoc, Seq("doc_id"), "left")
      .withColumn("removed",
        coalesce(col("removed_bis"), array().cast("array<int>")))
      // ascending kept positions; sequence(0, -1) would DESCEND, so the
      // nb = 0 case must short-circuit to an empty array
      .withColumn("kept_bis",
        when(col("nb") > 0,
          array_except(
            sequence(lit(0), col("nb") - 1), col("removed")))
          .otherwise(array().cast("array<int>")))
      .select(col("doc_id"),
        array_join(flatten(concat(
          transform(col("kept_bis"), bi =>
            slice(col("words"), bi * blockWords + 1, lit(blockWords))),
          array(slice(col("words"), col("nb") * blockWords + 1,
            size(col("words")) - col("nb") * blockWords)))), " ")
          .as("clean_text"),
        col("nb").cast("long").as("n_blocks"),
        size(col("removed")).cast("long").as("n_removed"))
      .orderBy(col("doc_id"))
  }

  def dupBlockStats(docs: DataFrame, blockWords: Int): DataFrame = {
    val inst = blocks(docs, blockWords)
      .select(col("doc_id"), md5(col("block")).as("bh"))
    val occ = inst.groupBy(col("bh")).agg(count(lit(1)).as("n_occ"))
    inst.join(occ, "bh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_blocks"))
      .withColumn("dup_tokens", col("n_dup_blocks") * blockWords)
      .orderBy(col("doc_id"))
  }
}
