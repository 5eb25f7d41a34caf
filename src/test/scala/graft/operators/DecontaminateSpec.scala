package graft.operators

import graft.SparkSpec

/** [[Decontaminate]] — eval-set n-gram decontamination semantics. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def evalSet = Seq((100L, evalText)).toDF("doc_id", "text")

  private def flaggedMap(train: Seq[(Long, String)], n: Int = 8,
      minHits: Long = 1): Map[Long, Long] =
    Decontaminate.flagged(train.toDF("doc_id", "text"), evalSet, n,
      minHits).as[(Long, Long)].collect().toMap

  test("an exact 8-word run from the eval set flags the training doc") {
    val m = flaggedMap(Seq(
      (1L, "x y alpha beta gamma delta epsilon zeta eta theta z"),
      (2L, "completely unrelated text with enough words to form windows here")))
    assert(m === Map(1L -> 1L))
  }

  test("seven shared words do not flag; scattered words do not flag") {
    val m = flaggedMap(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta padding more filler"),
      (2L, "alpha x beta y gamma z delta w epsilon v zeta u eta t theta")))
    assert(m.isEmpty)
  }

  test("a 9-word shared run yields two distinct overlapping 8-grams") {
    val m = flaggedMap(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota trailing")))
    assert(m === Map(1L -> 2L))
  }

  test("matching is normalization-insensitive (case, punctuation)") {
    val m = flaggedMap(Seq(
      (1L, "Alpha, BETA gamma... delta; epsilon ZETA eta (theta) rest")))
    assert(m === Map(1L -> 1L))
  }

  test("minHits thresholds the distinct-gram count") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota trailing"),
      (2L, "x y alpha beta gamma delta epsilon zeta eta theta z"))
    assert(flaggedMap(train, minHits = 2) === Map(1L -> 2L))
  }

  test("duplicate windows in one training doc count once (countDistinct)") {
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val m = flaggedMap(Seq((1L, s"$run filler one two three $run")))
    assert(m === Map(1L -> 1L))
  }
}
