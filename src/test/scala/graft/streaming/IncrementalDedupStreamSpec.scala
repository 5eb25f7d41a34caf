package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.IncrementalDedup

/** The crawl-ingest loop end to end: a document stream deduped across
  * micro-batches via [[IncrementalDedup.ingestBatch]] — each batch is
  * probed against the persisted index, survivors extend it, and a
  * replayed doc is self-healing (matches itself at Jaccard 1.0).
  */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the deep green forest chasing small animals"
  private val other = "completely different content about database " +
    "engines and query planners optimizing large distributed joins"
  private val third = "streaming ingestion pipelines append new crawled " +
    "documents every hour and must not keep near duplicate copies"

  test("cross-batch near-dups are dropped, novel docs kept, replay is safe") {
    val idxPath = tmpDir("ingest-idx")
    val keptDir = tmpDir("ingest-kept") + "/docs"
    val input = MemoryStream[(Long, String)](spark)
    // one checkpoint across restarts: each AvailableNow run processes
    // only offsets not yet committed, i.e. exactly the new batch
    val ckpt = tmpDir("ingest-ckpt")

    def runAvailable(): Unit = {
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalDedup.ingestBatch(batch, "t_ingest_idx", idxPath,
            keptDir, threshold = 0.5, buckets = 4)
        }
        .start()
      q.awaitTermination(120000)
    }

    try {
      // batch 1: two novel docs seed the index
      input.addData((0L, base), (1L, other))
      runAvailable()
      val kept1 = spark.read.parquet(keptDir)
      assert(kept1.count() === 2)

      // batch 2: a near-dup of doc 0 (must be dropped) + a novel doc
      val nearDup = base.split(" ").filter(_ != "green").mkString(" ")
      input.addData((2L, nearDup), (3L, third))
      runAvailable()
      val kept2 = spark.read.parquet(keptDir)
        .select(col("doc_id")).as[Long].collect().toSet
      assert(kept2 === Set(0L, 1L, 3L),
        s"near-dup of doc 0 must not survive ingest: $kept2")

      // batch 3: an exact replay of doc 3 (at-least-once redelivery) —
      // matches itself in the index at Jaccard 1.0 and is dropped
      input.addData((3L, third))
      runAvailable()
      val kept3 = spark.read.parquet(keptDir)
        .select(col("doc_id")).as[Long].collect().toSeq
      assert(kept3.sorted === Seq(0L, 1L, 3L),
        s"replayed doc must be self-healing, not duplicated: $kept3")

      // batch 4 (selfDedup): two near-dup NOVEL docs arrive together —
      // only the minimum doc_id survives, and it still dedupes against
      // the corpus first as usual
      val fresh = "entirely new subject matter regarding satellite " +
        "imagery pipelines and their storage formats on large clusters"
      val freshDup = fresh.split(" ").filter(_ != "large").mkString(" ")
      input.addData((10L, fresh), (11L, freshDup))
      val q4 = input.toDF().toDF("doc_id", "text")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          IncrementalDedup.ingestBatch(batch, "t_ingest_idx", idxPath,
            keptDir, threshold = 0.5, buckets = 4, selfDedup = true)
        }
        .start()
      q4.awaitTermination(120000)
      val kept4 = spark.read.parquet(keptDir)
        .select(col("doc_id")).as[Long].collect().toSeq
      assert(kept4.sorted === Seq(0L, 1L, 3L, 10L),
        s"intra-batch near-dup must collapse to the min doc_id: $kept4")

      // batch 5 after an "application restart": a fresh session has an
      // empty catalog — drop the table registrations (external tables;
      // data stays) and verify the index is re-registered from disk,
      // not clobbered: a near-dup of indexed doc 0 must STILL be caught
      // (kept-store doc_id anti-join alone cannot catch it)
      spark.sql("DROP TABLE t_ingest_idx_sigs")
      spark.sql("DROP TABLE t_ingest_idx_buckets")
      val nearDup2 = base.split(" ").filter(_ != "deep").mkString(" ")
      input.addData((20L, nearDup2), (21L, "totally novel content on " +
        "orchestration of container fleets across many data centers"))
      runAvailable()
      val kept5 = spark.read.parquet(keptDir)
        .select(col("doc_id")).as[Long].collect().toSeq
      assert(kept5.sorted === Seq(0L, 1L, 3L, 10L, 21L),
        s"post-restart ingest must re-register the disk index: $kept5")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_ingest_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS t_ingest_idx_buckets")
    }
  }

  test("packed b-bit probe mode in the streaming loop keeps the exact " +
      "same docs as the full-signature mode (r10 item 8)") {
    // identical input stream through BOTH probe modes (separate index
    // tables/dirs): the packed word only PREfilters, exact signature
    // agreement still decides — so outcomes must be identical while the
    // packed probe reads 1/32 of the signature index
    val nearDup = base.split(" ").filter(_ != "green").mkString(" ")
    val batches = Seq(
      Seq((0L, base), (1L, other)),
      Seq((2L, nearDup), (3L, third)),
      Seq((3L, third))) // replay
    val results = Seq(false, true).map { packed =>
      val tbl = if (packed) "t_pkstream_p" else "t_pkstream_f"
      val idxPath = tmpDir(s"pkstream-idx-$packed")
      val keptDir = tmpDir(s"pkstream-kept-$packed") + "/docs"
      val ckpt = tmpDir(s"pkstream-ckpt-$packed")
      val input = MemoryStream[(Long, String)](spark)
      try {
        batches.foreach { b =>
          input.addData(b)
          val q = input.toDF().toDF("doc_id", "text")
            .writeStream
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
              IncrementalDedup.ingestBatch(batch, tbl, idxPath,
                keptDir, threshold = 0.5, buckets = 4, packed = packed)
            }
            .start()
          q.awaitTermination(120000)
        }
        spark.read.parquet(keptDir)
          .select(col("doc_id")).as[Long].collect().toSet
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS ${tbl}_sigs")
        spark.sql(s"DROP TABLE IF EXISTS ${tbl}_buckets")
      }
    }
    assert(results(0) === Set(0L, 1L, 3L))
    assert(results(0) === results(1),
      s"packed and full-signature streaming ingest diverge: " +
        s"full=${results(0)} packed=${results(1)}")
  }

  test("crash before the first index write cannot duplicate the batch") {
    val idxPath = tmpDir("crash-idx")
    val keptDir = tmpDir("crash-kept") + "/docs"
    val b1 = Seq((0L, base), (1L, other)).toDF("doc_id", "text")
    // simulate: batch 1's kept-store write committed, crash BEFORE the
    // first index write, then foreachBatch replays the same batch
    b1.write.parquet(keptDir)
    try {
      IncrementalDedup.ingestBatch(b1, "t_crash_idx", idxPath, keptDir,
        threshold = 0.5, buckets = 4)
      val kept = spark.read.parquet(keptDir)
        .select(col("doc_id")).as[Long].collect().toSeq
      assert(kept.sorted === Seq(0L, 1L),
        s"replay without an index must not re-append kept docs: $kept")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_crash_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS t_crash_idx_buckets")
    }
  }
}
