package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage layout for the 100 TB regime: the two write-time decisions
  * that remove whole shuffles/scans from every downstream query.
  *
  *   - **Bucketing**: a fact table written `bucketBy(n, key)` is already
  *     hash-partitioned on disk; a join between two tables bucketed on
  *     the same key with the same bucket count runs with NO exchange on
  *     either side — at 100 TB that is the recurring fact-fact join
  *     (orders ⋈ lineitem) done without moving the fact tables, ever.
  *     The reference has no storage tier at all (it appends row-wise to
  *     Postgres, `db/init.sql`); this is the Spark-native replacement.
  *   - **Partitioning**: `partitionBy(col)` turns equality/range filters
  *     on that column into directory pruning — the scan never opens
  *     non-matching partitions (visible as PartitionFilters in the plan,
  *     vs PushedFilters which still opens every file).
  *
  * Both are asserted structurally in StorageSpec (no-Exchange join plan,
  * PartitionFilters in the pruned scan).
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted table (external, at `path`).
    * Bucket count is a layout contract: join partners must use the SAME
    * count to get the shuffle-free plan.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketKey: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
      .option("path", path)
      .saveAsTable(table)

  /** Shuffle-free co-located equi-join of two tables bucketed on the
    * join keys with equal bucket counts.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))

  /** Write `df` hive-partitioned by `partCol` — equality/IN filters on
    * it become directory pruning.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)
}
