package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BloomDedup]] — the sketch's contract is one-sided: NO false
  * negatives ever, false positives bounded by the configured FPP.
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def splitBlocks = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = SpanDedup.blocks(
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 0), 20)
    val batch = SpanDedup.blocks(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0), 20)
    (corpus, batch)
  }

  test("no false negatives: every corpus-present batch block is flagged") {
    val (corpus, batch) = splitBlocks
    val bloom = BloomDedup.build(
      corpus.select(xxhash64(col("block")).as("fp")), "fp",
      expectedItems = corpus.count(), fpp = 0.01)
    val probed = batch.withColumn("hit",
      BloomDedup.mightContain(bloom, xxhash64(col("block"))))
    val present = probed.join(
      corpus.select(col("block")).distinct(), "block")
    assert(present.count() > 0, "the split must produce real collisions")
    assert(present.filter(!col("hit")).isEmpty,
      "a bloom filter must never miss a present item")
  }

  test("false-positive rate stays near the configured FPP") {
    val (corpus, batch) = splitBlocks
    val bloom = BloomDedup.build(
      corpus.select(xxhash64(col("block")).as("fp")), "fp",
      expectedItems = corpus.count(), fpp = 0.01)
    val absent = batch.join(
        corpus.select(col("block")).distinct(), Seq("block"), "left_anti")
      .withColumn("hit", BloomDedup.mightContain(bloom, xxhash64(col("block"))))
    val n = absent.count().toDouble
    val fp = absent.filter(col("hit")).count().toDouble
    assert(fp / n <= 0.05,
      f"FPR ${fp / n}%.4f exceeds 5x the configured 1%% FPP ($fp%.0f/$n%.0f)")
  }

  test("planted round trip: inserted fingerprints all hit") {
    val fps = (1L to 1000L).map(i => i * 2654435761L).toDF("fp")
    val bloom = BloomDedup.build(fps, "fp", expectedItems = 1000, fpp = 0.01)
    val missed = fps.withColumn("hit", BloomDedup.mightContain(bloom, col("fp")))
      .filter(!col("hit"))
    assert(missed.isEmpty)
  }
}
