package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GopherRules]] on documents built to violate exactly one rule each. */
class GopherRulesSpec extends AnyFunSuite with SparkSpec {

  private def audited = {
    val s = spark
    import s.implicits._
    val good = ("the and " + "word " * 60).trim  // 62 words, stops, len ok
    val docs = Seq(
      (1L, good),
      (2L, "the and word short"),                  // < 50 words
      (3L, ("the and " + "a " * 60).trim),          // mean word length < 3
      (4L, ("the and " + "0 1 2 3 " * 15).trim),    // digits: alpha frac low
      (5L, ("word " * 60).trim)                     // no stop words
    ).toDF("doc_id", "text")
    GopherRules.audit(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  test("a document violating no rule passes") {
    val r = audited(1L)
    assert(r.getAs[Boolean]("pass"))
    assert(r.getAs[Long]("n_words") === 62L)
    assert(r.getAs[Long]("stop_hits") === 2L)
  }

  test("each rule gates independently and is individually reported") {
    val m = audited
    def flags(id: Long) = (
      m(id).getAs[Boolean]("ok_word_count"),
      m(id).getAs[Boolean]("ok_mean_len"),
      m(id).getAs[Boolean]("ok_alpha"),
      m(id).getAs[Boolean]("ok_stop_words"))
    assert(flags(2L)._1 === false, "word count under 50 must gate")
    assert(flags(3L)._2 === false, "mean word length under 3 must gate")
    assert(flags(4L)._3 === false, "digit-heavy doc must fail alpha rule")
    assert(flags(5L)._4 === false, "stop-word-free doc must gate")
    Seq(2L, 3L, 4L, 5L).foreach(id =>
      assert(!m(id).getAs[Boolean]("pass"), s"doc $id must fail overall"))
  }
}
