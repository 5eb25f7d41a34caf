package graft.examples

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.operators.IncrementalDedup

/** Runnable crawl-ingest demo (`sbt "runMain graft.examples.IngestDemo"`):
  * a document stream deduped across micro-batches against a growing
  * MinHash signature index — the training-data pipeline's steady-state
  * ingest loop (SURVEY §2.8 X25). Three batches arrive: the second
  * carries a near-duplicate of an already-kept doc (dropped via the
  * bucketed index probe) and the third replays an earlier doc verbatim
  * (dropped by the exact doc_id anti-join). Prints the kept corpus and
  * per-batch funnel.
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    import spark.implicits._

    val idxPath = java.nio.file.Files
      .createTempDirectory("ingest-idx").toString
    val keptDir = java.nio.file.Files
      .createTempDirectory("ingest-kept").toString + "/docs"
    val ckpt = java.nio.file.Files
      .createTempDirectory("ingest-ckpt").toString

    val input = MemoryStream[(Long, String)](spark)
    def runBatch(label: String): Unit = {
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          val n = batch.count()
          IncrementalDedup.ingestBatch(batch, "demo_ingest_idx", idxPath,
            keptDir, threshold = 0.5, buckets = 4, selfDedup = true)
          val kept = spark.read.parquet(keptDir).count()
          println(s"[$label] batch $id: $n arrived, corpus now $kept docs")
        }
        .start()
      q.awaitTermination(120000)
    }

    val base = "the quick brown fox jumps over the lazy dog and runs " +
      "far away into the deep green forest chasing small animals"
    input.addData((0L, base),
      (1L, "completely different content about database engines and " +
        "query planners optimizing large distributed joins"))
    runBatch("seed")

    // near-dup of doc 0 (one word dropped) + a novel doc
    input.addData(
      (2L, base.split(" ").filter(_ != "green").mkString(" ")),
      (3L, "streaming ingestion pipelines append new crawled documents " +
        "every hour and must not keep near duplicate copies"))
    runBatch("near-dup")

    // verbatim replay of doc 3 (at-least-once redelivery)
    input.addData((3L, "streaming ingestion pipelines append new " +
      "crawled documents every hour and must not keep near duplicate " +
      "copies"))
    runBatch("replay")

    println("kept corpus:")
    spark.read.parquet(keptDir).orderBy(col("doc_id"))
      .select(col("doc_id"), substring(col("text"), 1, 48).as("text_prefix"))
      .show(false)
    spark.sql("DROP TABLE IF EXISTS demo_ingest_idx_sigs")
    spark.sql("DROP TABLE IF EXISTS demo_ingest_idx_buckets")
    spark.stop()
  }
}
