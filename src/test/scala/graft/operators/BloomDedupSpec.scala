package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[BloomDedup]] — the sketch's contract is one-sided: NO false
  * negatives ever, false positives bounded near the designed ~1% FPP.
  * r18: the filter moved to pinned md5-60 double hashing so its bit
  * pattern replays in the DuckDB oracle (q85 is hash-exact); these
  * specs keep the semantic bounds and pin the JVM/Column hash twin.
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
      corpus.select(KmvSketch.h60(col("block")).as("fp")), "fp",
      expectedItems = corpus.count())
    val probed = batch.withColumn("hit",
      BloomDedup.mightContain(bloom, KmvSketch.h60(col("block"))))
    val present = probed.join(
      corpus.select(col("block")).distinct(), "block")
    assert(present.count() > 0, "the split must produce real collisions")
    assert(present.filter(!col("hit")).isEmpty,
      "a bloom filter must never miss a present item")
  }

  test("false-positive rate stays near the designed FPP") {
    val (corpus, batch) = splitBlocks
    val bloom = BloomDedup.build(
      corpus.select(KmvSketch.h60(col("block")).as("fp")), "fp",
      expectedItems = corpus.count())
    val absent = batch.join(
        corpus.select(col("block")).distinct(), Seq("block"), "left_anti")
      .withColumn("hit",
        BloomDedup.mightContain(bloom, KmvSketch.h60(col("block"))))
    val n = absent.count().toDouble
    val fp = absent.filter(col("hit")).count().toDouble
    assert(fp / n <= 0.05,
      f"FPR ${fp / n}%.4f exceeds 5x the designed 1%% FPP ($fp%.0f/$n%.0f)")
  }

  test("planted round trip: inserted fingerprints all hit") {
    val fps = (1L to 1000L).map(i => i * 2654435761L).toDF("fp")
    val bloom = BloomDedup.build(fps, "fp", expectedItems = 1000)
    val missed = fps
      .withColumn("hit", BloomDedup.mightContain(bloom, col("fp")))
      .filter(!col("hit"))
    assert(missed.isEmpty)
  }

  test("JVM h60 twin is bit-identical to the Column form") {
    val vals = Seq("b1:12345", "b2:-9876543210", "b1:0",
      "hello world", "b2:" + Long.MaxValue)
    val fromCol = vals.toDF("s")
      .select(KmvSketch.h60(col("s"))).as[Long].collect()
    val fromJvm = vals.map(BloomDedup.h60jvm)
    assert(fromCol.toSeq == fromJvm)
  }

  test("probe positions: Column lanes match the JVM build lanes") {
    val m = BloomDedup.mBits(1000)
    val fps = Seq(42L, -17L, 999999999999L)
    // a filter built from exactly these fps must hit all of them and
    // share the JVM position set: flip one word and the probe misses
    val bloom = BloomDedup.build(fps.toDF("fp"), "fp", 1000)
    val jvmBits = fps.flatMap(BloomDedup.positions(_, m)).toSet
    val setBits = bloom.words.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).filter(b => (w & (1L << b)) != 0L)
        .map(b => wi * 64L + b)
    }.toSet
    assert(bloom.m == m)
    assert(setBits == jvmBits)
  }
}
