package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.MockScorers.normalize

/** Training-shard assignment — the LAST step of a corpus pipeline: after
  * dedup/filter/mixture, the surviving docs are dealt into N shards that
  * trainers read independently. Two properties matter at 100 TB:
  *
  *   - **Deterministic**: shard(doc) is a pure function of doc_id (the
  *     q30/q63/q80 mirrorable-LCG technique, never `rand()`), so a
  *     retried task, a re-run job, or an incremental append deals every
  *     doc to the SAME shard — trainers can resume and dedupe-by-
  *     construction across runs.
  *   - **Decorrelated**: the LCG scrambles doc_id order, so crawl
  *     locality (adjacent ids = same site/day) does not concentrate in
  *     a shard; each shard is an unbiased corpus sample.
  *
  * The write path is one hash shuffle on the shard column, then a
  * hive-partitioned write — a trainer reading shard=k directory-prunes
  * the other N-1 shards ([[graft.sources.Warehouse]] X19 discipline).
  */
object Sharding {

  /** Deterministic shard id in [0, nShards): LCG-scrambled doc_id. */
  def shardCol(docId: Column, nShards: Int): Column =
    pmod(pmod(docId * 1103515245L + 12345L, lit(1000000007L)),
      lit(nShards.toLong))

  /** Per-shard plan stats over `docs(doc_id, text)`: doc count, token
    * mass (q49's token definition), and the doc_id span — the balance
    * check a pipeline runs before committing a shard layout. Exact.
    */
  def shardStats(docs: DataFrame, nShards: Int): DataFrame =
    docs
      .select(col("doc_id"),
        shardCol(col("doc_id"), nShards).as("shard"),
        size(split(normalize(col("text")), " ")).cast("long").as("tokens"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("tok_mass"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))

  /** Deal `docs` into `nShards` hive-partitioned shard directories at
    * `path` (shard=0 … shard=N-1). One shuffle on the shard column;
    * rows sorted by (shard, doc_id) within tasks so file contents are
    * deterministic run-over-run.
    */
  def writeShards(docs: DataFrame, path: String, nShards: Int): Unit =
    docs
      .withColumn("shard", shardCol(col("doc_id"), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
