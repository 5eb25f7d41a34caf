package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ImportanceResampling]] behavior on a corpus planted with a clear
  * target/off-target vocabulary split, where the importance weights are
  * far larger than the Gumbel noise — so selection outcomes are
  * deterministic facts, not statistical tendencies.
  */
class ImportanceResamplingSpec extends AnyFunSuite with SparkSpec {

  // target-style docs repeat bigrams the 'en' slice is built from;
  // off-target docs use a disjoint vocabulary, so every one of their
  // bigrams is unseen in the target model (maximally negative terms)
  private def corpus = {
    val s = spark
    import s.implicits._
    val likeTarget = "the quick brown fox jumps over the lazy dog " * 4
    val offTarget = "zumba quark flux nebula krypton vortex plasma " * 4
    val rows =
      (1L to 8L).map(i => (i, "en", likeTarget)) ++
        (11L to 18L).map(i => (i, "xx", likeTarget)) ++
        (21L to 28L).map(i => (i, "yy", offTarget))
    rows.toDF("doc_id", "lang", "text")
  }

  private def selected(k: Int) = ImportanceResampling
    .resample(corpus, isTarget = col("lang") === "en", k = k)
    .collect()

  test("selection is capped at k and ordered by doc_id") {
    val rows = selected(5)
    assert(rows.length === 5)
    assert(rows.map(_.getLong(0)).toSeq === rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("target-like docs outweigh off-target docs decisively") {
    // 16 target-like docs exist; at k = 16 every selected doc must be
    // one of them — off-target docs' unseen bigrams give them logw
    // deficits of tens of log-units, far beyond any Gumbel draw
    val langs = selected(16).map(_.getString(1)).toSet
    assert(langs === Set("en", "xx"),
      "off-target 'yy' docs must not survive importance resampling")
  }

  test("identical documents get identical rounded weights") {
    // the decimal-sum-of-rounded-terms discipline makes logw_r a pure
    // function of the text, independent of partitioning or row order
    val byLang = selected(16).groupBy(_.getString(1))
    for ((_, rows) <- byLang)
      assert(rows.map(_.getDouble(3)).toSet.size === 1)
  }

  test("resampling is retry-stable") {
    val a = selected(10).map(r => (r.getLong(0), r.getDouble(3))).toSeq
    val b = selected(10).map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(a === b)
  }
}
