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
      // length-3 digit tokens keep mean_word_len exactly 3.0 (passes),
      // so ONLY the alphabetic rule gates this doc
      (4L, ("the and " + "000 111 222 " * 20).trim),
      (5L, ("word " * 60).trim),                    // no stop words
      // 'the' twice = ONE distinct list word: the published rule is
      // membership, so occurrence-counting would wrongly pass this
      (6L, ("the the " + "word " * 60).trim)
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
    assert(flags(4L) === ((true, true, false, true)),
      "doc 4 must fail the alpha rule and ONLY the alpha rule")
    assert(flags(5L)._4 === false, "stop-word-free doc must gate")
    Seq(2L, 3L, 4L, 5L).foreach(id =>
      assert(!m(id).getAs[Boolean]("pass"), s"doc $id must fail overall"))
  }

  test("stop-word rule counts distinct list words, not occurrences") {
    // doc 6 contains 'the' twice and nothing else from the list —
    // Rae et al.'s rule is 'at least two OF THE FOLLOWING words', so
    // this doc must gate (an occurrence counter would score 2 and pass)
    val r = audited(6L)
    assert(r.getAs[Long]("stop_hits") === 1L)
    assert(r.getAs[Boolean]("ok_stop_words") === false)
    assert(!r.getAs[Boolean]("pass"))
  }
}
