package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * (doc_id, block text). The shared kernel of [[dupBlockStats]] and
    * the bloom pre-filter ([[BloomDedup]]) — one block definition, so
    * the exact and sketched paths cannot drift.
    */
  def blocks(docs: DataFrame, blockWords: Int): DataFrame =
    docs
      .select(col("doc_id"), split(normalize(col("text")), " ").as("words"))
      .filter(size(col("words")) >= blockWords)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          floor(size(col("words")) / blockWords).cast("int") - 1)).as("bi"),
        col("words"))
      .select(col("doc_id"),
        concat_ws(" ",
          slice(col("words"), col("bi") * blockWords + 1, lit(blockWords)))
          .as("block"))

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
