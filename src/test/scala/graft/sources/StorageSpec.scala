package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout guardrails ([[Warehouse]]): bucketing must produce a
  * shuffle-free fact-fact join; partitioning must turn filters into
  * directory pruning. Both are THE scan/shuffle economics at 100 TB, so
  * they are asserted structurally on the physical plan.
  */
class StorageSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.executedPlan.toString

  test("bucketed fact-fact join runs with no exchange on either side") {
    val base = tmpDir("bucketed")
    Warehouse.writeBucketed(Tables(spark, sf0001, "orders"),
      "t_orders_b", s"$base/orders", "o_orderkey", 8)
    Warehouse.writeBucketed(Tables(spark, sf0001, "lineitem"),
      "t_lineitem_b", s"$base/lineitem", "l_orderkey", 8)
    try {
      // disable auto-broadcast so the join would OTHERWISE shuffle both
      // sides — proving bucketing (not size) removed the exchanges
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Warehouse.bucketedJoin(spark, "t_orders_b",
          "t_lineitem_b", "o_orderkey", "l_orderkey")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val plan = planOf(joined)
        assert(plan.contains("SortMergeJoin") ||
          plan.contains("ShuffledHashJoin"), plan.take(2000))
        val joinSection = plan.substring(plan.indexOf("Join"))
        assert(!joinSection.contains("Exchange hashpartitioning"),
          s"bucketed join must not re-shuffle its inputs:\n${plan.take(3000)}")
        assert(plan.contains("SelectedBucketsCount"),
          s"scan must be bucket-aware:\n${plan.take(3000)}")
        // whole-plan exchange budget: the ONLY shuffle allowed is the
        // final agg's re-key on o_orderpriority — neither fact table may
        // move (the q04 shape at 100 TB rests on exactly this)
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        assert(exchanges <= 1,
          s"expected at most the agg exchange, found $exchanges:\n" +
            plan.take(3000))
        // correctness: same result as the plain parquet join
        val expected = Tables(spark, sf0001, "orders")
          .join(Tables(spark, sf0001, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        assert(joined.orderBy("o_orderpriority").collect().toSeq ===
          expected.orderBy("o_orderpriority").collect().toSeq)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_orders_b")
      spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    }
  }

  test("partitioned write turns an equality filter into directory pruning") {
    val dir = tmpDir("partitioned")
    Warehouse.writePartitioned(
      Tables(spark, sf0001, "events")
        .select(col("event_id"), col("user_id"), col("event_type")),
      dir, "event_type")
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("event_type#"),
      s"filter must prune partitions, not rows:\n$plan")
    // the partition filter must NOT degrade to a post-scan row filter
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"),
      s"partition column must not be a data filter:\n$plan")
    assert(q.count() ===
      Tables(spark, sf0001, "events")
        .filter(col("event_type") === "click").count())
  }

  test("schema evolution: widened files merge with nulls for old rows") {
    // a long-lived sink's schema grows (new feature columns); readers
    // must see the union schema with nulls for pre-widening files
    val dir = tmpDir("evolve") + "/docs"
    val v1 = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"))
    val v2 = Tables(spark, sf0001, "documents")
      .select(col("doc_id") + 1000000L as "doc_id", col("lang"),
        col("n_chars"))
    v1.write.parquet(dir)
    v2.write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "lang", "n_chars"))
    assert(merged.count() === v1.count() + v2.count())
    // old rows: null n_chars; new rows: populated
    assert(merged.filter(col("doc_id") < 1000000L &&
      col("n_chars").isNotNull).count() === 0)
    assert(merged.filter(col("doc_id") >= 1000000L &&
      col("n_chars").isNull).count() === 0)
  }

  test("range-sorted write produces files with disjoint key ranges") {
    val dir = tmpDir("rangesorted") + "/events"
    val src = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    Warehouse.writeSortedByRange(src, dir, "event_id", partitions = 4)
    // the skippability invariant: per-file [min,max] of the sort key
    // must not overlap — otherwise parquet stats can't exclude files
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("event_id")).as("lo"), max(col("event_id")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length === 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: ${ranges.toSeq}")
      case _ =>
    }
    assert(spark.read.parquet(dir).count() === src.count())
  }

  test("compaction merges small files without changing the data") {
    val dir = tmpDir("compact") + "/events"
    val src = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    // simulate a streaming sink's debris: 20 per-batch files
    src.repartition(20).write.parquet(dir)
    def dataFiles(): Seq[java.io.File] =
      new java.io.File(dir).listFiles.toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    assert(dataFiles().size === 20)
    val before = src.orderBy(col("event_id")).collect().toSeq
    val totalBytes = dataFiles().map(_.length).sum
    // target half the total → exactly 2 files. Trailing slash on
    // purpose: the tmp dir must still land as a SIBLING (a child tmp
    // would be destroyed by the swap along with the source)
    val n = Warehouse.compact(spark, dir + "/",
      targetBytes = totalBytes / 2 + 1)
    assert(n === 2 && dataFiles().size === 2,
      s"expected 2 compacted files, got $n / ${dataFiles().size}")
    assert(spark.read.parquet(dir).orderBy(col("event_id")).collect().toSeq
      === before, "compaction must preserve the data exactly")
  }

  test("a compact killed between the two swap renames loses nothing: " +
      "the next call restores the original from ._old and completes") {
    val dir = tmpDir("compact-kill") + "/events"
    val src = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    src.repartition(8).write.parquet(dir)
    val before = src.orderBy(col("event_id")).collect().toSeq
    // stage the exact mid-swap window: a finished rewrite stranded in
    // `._compacting` and the live dir already renamed to `._old`
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    val old = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "._old")
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + "._compacting")
    src.repartition(1).write.parquet(tmp.toString)
    require(fs.rename(p, old))
    assert(!fs.exists(p), "window staged: live dir missing")
    // the next compact must FIRST restore ._old, then compact normally
    val n = Warehouse.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(n === 1)
    assert(spark.read.parquet(dir).orderBy(col("event_id")).collect().toSeq
      === before, "healing + compaction must preserve the data exactly")
    assert(!fs.exists(old) && !fs.exists(tmp), "swap debris cleaned up")
  }
}
