package graft.operators

import graft.SparkSpec

/** [[SequencePacking]] — stream-chunking pack assignment semantics. */
class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  // texts with exact whitespace token counts
  private def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  private def assignMap(docs: Seq[(String, Long, String)], budget: Long)
      : Map[Long, (Long, Long)] =
    SequencePacking.assign(docs.toDF("lang", "doc_id", "text"), budget)
      .select("doc_id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect()
      .map { case (id, off, pack) => id -> (off, pack) }.toMap

  test("docs fill a pack until the budget boundary, then roll over") {
    val m = assignMap(Seq(
      ("en", 1L, words(5)), ("en", 2L, words(5)), ("en", 3L, words(5))),
      budget = 10)
    assert(m === Map(1L -> (0L, 0L), 2L -> (5L, 0L), 3L -> (10L, 1L)))
  }

  test("a document longer than the budget straddles cuts (stream chunking)") {
    // doc 2 spans offsets 3..27: it belongs to the chunk of its FIRST
    // token (pack 0); doc 3 then starts at offset 28 → pack 2 — pack 1
    // is interior to doc 2, exactly like packed pretraining
    val m = assignMap(Seq(
      ("en", 1L, words(3)), ("en", 2L, words(25)), ("en", 3L, words(4))),
      budget = 10)
    assert(m === Map(1L -> (0L, 0L), 2L -> (3L, 0L), 3L -> (28L, 2L)))
  }

  test("shards pack independently (no cross-language offsets)") {
    val m = assignMap(Seq(
      ("en", 1L, words(8)), ("vi", 2L, words(8)), ("en", 3L, words(8))),
      budget = 10)
    // vi restarts at offset 0 even though en rows surround it
    assert(m(2L) === (0L, 0L))
    assert(m(1L) === (0L, 0L) && m(3L) === (8L, 0L))
  }

  test("pack summary aggregates docs and token mass per (shard, pack)") {
    val packs = SequencePacking.packs(
      Seq(("en", 1L, words(5)), ("en", 2L, words(5)), ("en", 3L, words(5)))
        .toDF("lang", "doc_id", "text"), budget = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(packs === Seq(("en", 0L, 2L, 10L), ("en", 1L, 1L, 5L)))
  }
}
