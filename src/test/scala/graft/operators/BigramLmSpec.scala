package graft.operators

import graft.SparkSpec

/** [[BigramLm.scores]] on a planted corpus with hand-countable bigram
  * frequencies.
  */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("frequency mass and hapax counts match hand counts") {
    val docs = Seq(
      (1L, "a b c"),       // bigrams: "a b", "b c"
      (2L, "a b a b"),     // "a b"×2, "b a"
      (3L, "x y")          // "x y" (corpus-unique)
    ).toDF("doc_id", "text")
    // model: "a b"→3, "b c"→1, "b a"→1, "x y"→1
    val out = BigramLm.scores(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((2L, 4L, 1L)), "doc 1: 3 ('a b') + 1 ('b c'); 'b c' hapax")
    assert(out(2L) == ((3L, 7L, 1L)), "doc 2: 2×3 ('a b') + 1 ('b a')")
    assert(out(3L) == ((1L, 1L, 1L)), "doc 3: all hapax")
  }

  test("single-word docs are excluded; n_bigrams = words - 1") {
    val docs = Seq((1L, "only"), (2L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val out = BigramLm.scores(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getLong(1) == 4L)
  }
}
