package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CurationIngest

/** [[CurationIngest]] — the streaming curation loop end to end: a
  * document stream quality-gated, PII-redacted, and near-dup-ingested
  * across micro-batches, with one checkpoint across restarts.
  */
class CurationIngestSpec extends SparkSpec {
  import spark.implicits._

  // ≥15 clean words → quality ≥ 0.3 at zero punctuation
  private val goodA = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the deep green forest chasing small animals"
  private val goodB = "database engines process queries with planners " +
    "optimizing large distributed joins across many partitions every day " +
    "contact me at alice@mail0.com for details"
  private val lowQ = "too short"
  private val goodD = "streaming ingestion pipelines append new crawled " +
    "documents every hour and must not keep near duplicate copies"

  test("stream is gated, redacted, and deduped across batches") {
    val idxPath = tmpDir("cur-idx")
    val keptDir = tmpDir("cur-kept") + "/docs"
    val ckpt = tmpDir("cur-ckpt")
    val input = MemoryStream[(Long, String)](spark)

    def runAvailable(): Unit = {
      val q = CurationIngest.stream(
        input.toDF().toDF("doc_id", "text"),
        "t_cur_idx", idxPath, keptDir, ckpt, threshold = 0.5, buckets = 4)
      q.awaitTermination(120000)
    }

    try {
      // batch 1: two good docs (one carrying an email) + a low-quality doc
      input.addData((0L, goodA), (1L, goodB), (2L, lowQ))
      runAvailable()
      val kept1 = spark.read.parquet(keptDir)
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      assert(kept1.keySet === Set(0L, 1L),
        s"low-quality doc must be gated out: ${kept1.keySet}")
      assert(kept1(1L).contains("<EMAIL>") && !kept1(1L).contains("@mail"),
        s"PII must be redacted before the kept store: ${kept1(1L)}")

      // batch 2: a near-dup of doc 0 (dropped via the index), an exact
      // replay of doc 1 (dropped via the kept store), and a novel doc.
      // The near-dup's REDACTED form must match doc 0's redacted form —
      // which it does, because redaction precedes indexing on both.
      val nearDupA = goodA.split(" ").filter(_ != "green").mkString(" ")
      input.addData((3L, nearDupA), (1L, goodB), (4L, goodD))
      runAvailable()
      val kept2 = spark.read.parquet(keptDir)
        .select($"doc_id").as[Long].collect().toSeq
      assert(kept2.sorted === Seq(0L, 1L, 4L),
        s"near-dup and replay must be dropped, novel doc kept: $kept2")

      // the index's shingle space must be over redacted text: no raw
      // email fragments in the kept store anywhere
      val raw = spark.read.parquet(keptDir)
        .filter($"text".contains("@mail")).count()
      assert(raw === 0L, "raw PII leaked into the kept store")
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_cur_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS t_cur_idx_buckets")
    }
  }

  test("prepare is a map-only projection (no exchange, no UDF fence)") {
    val docs = graft.sources.Tables(spark, sf0001, "documents")
      .select($"doc_id", $"text")
    val plan = CurationIngest.prepare(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"prepare must not shuffle:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")),
      s"prepare must stay codegen'd:\n$plan")
  }
}
