package graft.operators

import graft.SparkSpec

/** [[SpanDedup.dupBlockStats]] on a planted corpus where every block's
  * duplication status is known by construction.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private val shared = words("s", 20) // block shared by docs 1 and 2

  test("cross-doc, within-doc, and short-doc cases all resolve correctly") {
    val docs = Seq(
      // doc 1: shared block + unique block
      (1L, shared + " " + words("a", 20)),
      // doc 2: shared block + unique block + 19-word tail (ignored)
      (2L, shared + " " + words("b", 20) + " " + words("t", 19)),
      // doc 3: 19 words — no full block, excluded from output
      (3L, words("c", 19)),
      // doc 4: the same 20 words twice — within-doc duplication
      (4L, words("d", 20) + " " + words("d", 20))
    ).toDF("doc_id", "text")

    val out = SpanDedup.dupBlockStats(docs, blockWords = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    assert(out.keySet == Set(1L, 2L, 4L), "doc 3 has no full block")
    assert(out(1L) == ((2L, 1L, 20L)), "doc 1: shared block flagged")
    assert(out(2L) == ((2L, 1L, 20L)), "doc 2: tail ignored, shared flagged")
    assert(out(4L) == ((2L, 2L, 40L)), "doc 4: both within-doc copies flagged")
  }

  test("a block is duplicated only on exact content match") {
    val docs = Seq(
      (1L, words("x", 20)),
      (2L, words("x", 19) + " y20") // differs in the last word only
    ).toDF("doc_id", "text")
    val out = SpanDedup.dupBlockStats(docs, blockWords = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
  }
}
