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

  /** Write `df` range-partitioned AND sorted on `sortCol`: every output
    * file covers a disjoint key range, so parquet min/max row-group
    * stats turn key equality/range/IN predicates into file- and
    * row-group-level SKIPS (this is what makes pushed-down filters —
    * e.g. [[graft.operators.IncrementalDedup]]'s candidate-id IN list —
    * cheap at 100 TB; on an unsorted layout every file's min/max spans
    * the whole key space and nothing is skippable). The clustered-layout
    * counterpart of [[writeBucketed]]: bucketing buys exchange-free
    * JOINS, range-sorting buys scan-range SKIPS.
    */
  def writeSortedByRange(df: DataFrame, path: String, sortCol: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions,
      org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory's small files into ~`targetBytes` files
    * — the maintenance job behind every foreachBatch-append sink (each
    * micro-batch writes its own files; a 5-second trigger alone produces
    * ~17k files/day, and at 100 TB the resulting footer/open overhead
    * dominates scan setup). NOT for a `writeStream.format("parquet")`
    * FileStreamSink directory — its `_spark_metadata` commit log cannot
    * survive the swap, and a `require` refuses it. Sizing is from the
    * FileSystem listing, not a data scan; the rewrite is one job.
    * Returns the new file count.
    *
    * The swap (rename-away: dir → `._old`, tmp → dir, drop `._old`) is
    * not atomic on object stores — concurrent readers see a missing
    * directory for the rename window; run it from the owning pipeline
    * (e.g. between micro-batches), or use [[VersionedTable]] (X110) —
    * the manifest-and-pointer format whose compaction commits a new
    * version while pinned readers keep their file list — where that
    * window is unacceptable. A kill inside the window never loses
    * data: the original survives in `._old` and the next call
    * restores it before doing anything else.
    *
    * For a hive-PARTITIONED directory, compact each leaf partition
    * directory individually (pass the partition path): a whole-root
    * rewrite here would read partition columns out of the directory
    * names and write them back flattened into the files.
    */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val raw = new org.apache.hadoop.fs.Path(dir)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify BEFORE deriving the tmp sibling: "dir + suffix" on a
    // trailing-slash input would nest tmp INSIDE the source, and the
    // delete-then-rename would destroy both copies
    val path = fs.makeQualified(raw)
    require(path.getParent != null, s"refusing to compact a root: $path")
    val tmp = new org.apache.hadoop.fs.Path(path.getParent,
      path.getName + "._compacting")
    val old = new org.apache.hadoop.fs.Path(path.getParent,
      path.getName + "._old")
    // heal a prior attempt killed mid-swap: the rename-away protocol
    // below never deletes the only copy, so either the live dir still
    // exists (drop the leftover `._old`) or `._old` holds the original
    // (restore it; the stale `._compacting` rewrite is redone below) —
    // the previous delete-then-rename shape could strand the only copy
    // in tmp and then DELETE it on the next call
    if (fs.exists(old)) {
      if (!fs.exists(path))
        require(fs.rename(old, path), s"restore $old -> $path failed")
      else fs.delete(old, true)
    }
    // a streaming FileStreamSink directory carries a _spark_metadata
    // commit log that the swap below cannot preserve coherently (its
    // file list would no longer match); those sinks need a
    // format-native compaction, not a directory rewrite
    require(!fs.exists(
      new org.apache.hadoop.fs.Path(path, "_spark_metadata")),
      s"$dir has a _spark_metadata commit log; directory-swap compaction " +
        "would orphan it")
    // a crashed prior attempt leaves a populated tmp dir; clear it so
    // neither the size calc nor the rewrite sees stale files
    if (fs.exists(tmp)) fs.delete(tmp, true)
    def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
      // walk up to the compacted root: a visible basename under a
      // hidden ANCESTOR (_temporary debris) must not count either
      var cur = p
      var h = false
      while (cur != null && cur != path) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) h = true
        cur = cur.getParent
      }
      h
    }
    val files = fs.listFiles(path, true)
    var totalBytes = 0L
    while (files.hasNext) {
      val f = files.next()
      if (!hidden(f.getPath)) totalBytes += f.getLen
    }
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // success marker checked BEFORE destroying the source: a failed or
    // partial rewrite must leave the original directory untouched
    require(fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")),
      s"compaction rewrite of $dir did not commit; original left in place")
    // rename-away swap: the original is set aside, never deleted while
    // it is the only copy — a kill between the two renames leaves the
    // original in `._old` (readers fail loudly on the missing dir; the
    // next compact call restores it via the healing step above)
    require(fs.rename(path, old), s"rename $path -> $old failed")
    require(fs.rename(tmp, path), s"rename $tmp -> $path failed")
    fs.delete(old, true)
    n
  }
}
