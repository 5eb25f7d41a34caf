package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SpanDedup.removeBoilerplate]] on a corpus where every block's doc
  * frequency is chosen by hand (blockWords = 2, minDocs = 2).
  */
class BoilerplateSpec extends AnyFunSuite with SparkSpec {

  private def rewritten = {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd ee"), // [aa bb][cc dd] + tail "ee"
      (2L, "aa bb xx yy zz"), // shares [aa bb] with doc 1 → boilerplate
      (3L, "pp qq pp qq rr"), // [pp qq] twice IN ONE doc — not boilerplate
      (4L, "w")               // shorter than one block — passthrough
    ).toDF("doc_id", "text")
    SpanDedup.removeBoilerplate(docs, blockWords = 2, minDocs = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("cross-doc blocks are cut from every document, in order") {
    val m = rewritten
    assert(m(1L) === (("cc dd ee", 2L, 1L)))
    assert(m(2L) === (("xx yy zz", 2L, 1L)))
  }

  test("within-doc repetition is NOT boilerplate (doc frequency, not count)") {
    // "pp qq" occurs twice but only in doc 3: repetition (q69's concern),
    // not boilerplate — both instances survive, original order intact
    assert(rewritten(3L) === (("pp qq pp qq rr", 2L, 0L)))
  }

  test("sub-block documents pass through untouched") {
    assert(rewritten(4L) === (("w", 0L, 0L)))
  }
}
