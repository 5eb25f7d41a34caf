package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.Tag

import graft.SparkSpec
import graft.operators.CurationIngest

/** Bounded SOAK of the streaming curation loop (VERDICT r7 item 6):
  * CurationIngestSpec proves the semantics on a handful of batches;
  * this drives [[CurationIngest]] through 100 micro-batches with a
  * mid-run kill+restart and an explicit crash-replay, asserting the two
  * properties only a long run can show — per-batch cost does NOT grow
  * with the accumulated corpus (the X25 contract: work ∝ batch size,
  * index probed exchange-free), and the kept store stays EXACTLY-ONCE
  * VISIBLE across restart and replay (no duplicate and no lost doc in
  * 100 batches of gated/deduped/novel traffic).
  */
object SlowTest extends Tag("graft.SlowTest")

class SoakSpec extends SparkSpec {
  import spark.implicits._

  // 40 lowercase words: every novel doc draws 18 by an id-seeded LCG —
  // deterministic, quality-passing (≥15 clean words, zero punctuation),
  // and mutually non-near-dup (two random ordered 3-shingle sets from a
  // 40^3 space share far less than the 1/3 a 0.5-Jaccard match needs)
  private val bank = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
    "cedar", "dune", "ember", "fjord", "grove", "haven", "isle",
    "jetty", "knoll", "lagoon", "mesa", "nadir")

  private def novelText(id: Long): String = {
    var seed = id * 2654435761L + 17L
    (0 until 18).map { _ =>
      seed = seed * 1103515245L + 12345L
      bank((((seed % 40) + 40) % 40).toInt)
    }.mkString(" ")
  }

  // drop one interior word: 13 of the original 16 3-shingles survive →
  // Jaccard 13/18 ≈ 0.72, comfortably above the 0.5 ingest threshold
  private def nearDupOf(text: String): String = {
    val w = text.split(" ")
    (w.take(9) ++ w.drop(10)).mkString(" ")
  }

  test("100-batch soak: restart + replay stay exactly-once, per-batch cost flat",
      SlowTest) {
    val idxPath = tmpDir("soak-idx")
    val keptDir = tmpDir("soak-kept") + "/docs"
    val ckpt = tmpDir("soak-ckpt")
    val input = MemoryStream[(Long, String)](spark)
    val (nBatches, perBatch) = (100, 8)

    def start(): StreamingQuery = CurationIngest.stream(
      input.toDF().toDF("doc_id", "text"), "t_soak_idx", idxPath, keptDir,
      ckpt, threshold = 0.5, buckets = 4,
      trigger = Trigger.ProcessingTime(0))

    def batchData(b: Int): Seq[(Long, String)] =
      (0 until perBatch).map { j =>
        val id = (b * perBatch + j).toLong
        if (j == 3) (id, "too short junk")                 // gated out
        else if (j == 7 && b > 0)                          // cross-batch dup
          (id, nearDupOf(novelText(((b - 1) * perBatch).toLong)))
        else (id, novelText(id))                           // novel, kept
      }

    var q = start()
    val secs = Array.ofDim[Double](nBatches)
    try {
      for (b <- 0 until nBatches) {
        if (b == nBatches / 2) { q.stop(); q = start() } // kill+restart
        val t0 = System.nanoTime()
        input.addData(batchData(b): _*)
        q.processAllAvailable()
        secs(b) = (System.nanoTime() - t0) / 1e9
      }
      q.stop()

      // exactly-once-visible under an explicit crash-replay: re-running
      // an already-committed batch through the foreachBatch body (what a
      // restart from a pre-commit crash does) must change nothing
      val keptBefore = spark.read.parquet(keptDir)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      CurationIngest.step(
        batchData(nBatches - 1).toDF("doc_id", "text"),
        "t_soak_idx", idxPath, keptDir, threshold = 0.5, buckets = 4)
      val keptAfter = spark.read.parquet(keptDir)
        .select($"doc_id").as[Long].collect().sorted.toSeq
      assert(keptAfter === keptBefore,
        "replaying a committed batch must be invisible in the kept store")

      // exactly the novel-good ids, each exactly once, none lost: the
      // low-quality doc of every batch and the near-dup of every batch
      // after the first must be absent
      val expected = (0 until nBatches).flatMap { b =>
        (0 until perBatch).collect {
          case j if j != 3 && !(j == 7 && b > 0) => (b * perBatch + j).toLong
        }
      }.sorted
      assert(keptAfter === expected,
        s"kept store diverged: ${keptAfter.size} rows vs ${expected.size} expected")

      // steady state: if per-batch cost grew with the accumulated corpus
      // (by batch 95 the index holds ~8× the docs of batch 15), the tail
      // median would blow past this band; 3× absorbs host noise only
      def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val early = median(secs.slice(10, 20).toSeq)
      val late = median(secs.slice(nBatches - 10, nBatches).toSeq)
      info(f"per-batch median: early=$early%.2f s late=$late%.2f s " +
        f"(total ${secs.sum}%.1f s, ${nBatches * perBatch / secs.sum}%.1f docs/s)")
      assert(late <= 3.0 * early,
        f"per-batch cost grew: early median $early%.2f s -> late $late%.2f s")
    } finally {
      try q.stop() catch { case _: Throwable => }
      spark.sql("DROP TABLE IF EXISTS t_soak_idx_sigs")
      spark.sql("DROP TABLE IF EXISTS t_soak_idx_buckets")
    }
  }
}
