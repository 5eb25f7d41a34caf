package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Sequence packing — assigning documents to fixed token-budget training
  * sequences, the step between a cleaned corpus and a dataloader.
  * Semantics are packed-pretraining stream chunking: within a shard the
  * corpus is (logically) concatenated in a deterministic order and cut
  * every `budget` tokens; a document belongs to the chunk its first
  * token lands in (long documents straddle cuts — that is what packed
  * training does, rather than bin-packing with padding).
  *
  * Scale shape: the running token offset is a window sum PARTITIONED BY
  * THE SHARD — no global ordering, no single-partition window (the
  * classic running-total scale trap). Each shard's window sorts only its
  * own rows; at 100 TB the shard key is (lang, hash-bucket) so shard
  * size stays bounded while pack ids remain deterministic per shard.
  * Token counts reuse q49's whitespace definition over the shared
  * normalization, so packing can't drift from the token-stats family.
  */
object SequencePacking {

  /** Per-doc pack assignment: (shard, doc_id, tokens, start_offset,
    * pack_id), deterministic given the shard/order columns.
    */
  def assign(docs: DataFrame, budget: Long, shardCol: String = "lang",
      orderCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(shardCol), col(orderCol),
        size(split(normalize(col(textCol)), " ")).cast("long").as("tokens"))
      .withColumn("start_offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("pack_id", expr(s"start_offset div $budget"))
  }

  /** Pack-level summary: docs and token mass per (shard, pack). */
  def packs(docs: DataFrame, budget: Long, shardCol: String = "lang",
      orderCol: String = "doc_id", textCol: String = "text"): DataFrame =
    assign(docs, budget, shardCol, orderCol, textCol)
      .groupBy(col(shardCol), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("pack_tokens"))
      .orderBy(col(shardCol), col("pack_id"))
}
