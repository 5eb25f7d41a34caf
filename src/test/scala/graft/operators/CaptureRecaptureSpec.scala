package graft.operators

import graft.SparkSpec

/** [[CaptureRecapture]] (X231) oracles: hand-computed Chapman N̂ on a
  * planted id grid, exact-duplicate collapse to one individual, and
  * the m = 0 disjoint-snapshot case staying defined.
  */
class CaptureRecaptureSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)])
      : (Long, Long, Long, Long, Double, Double, Double) = {
    val dir = tmpDir("cr")
    docs.map { case (id, text) =>
      (id, text, "en", "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CaptureRecapture.q263.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6))
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ids 0..11 with unique texts: n1=8, n2=6, m=4, Chapman 11.6") {
    val docs = (0L to 11L).map(i => i -> s"doc number $i unique words")
    val (n1, n2, m, nTrue, nHat, lo, hi) = run(docs)
    // A = id % 3 != 0 -> 8 ids; B = odd -> 6; both -> {1,5,7,11}
    assert((n1, n2, m, nTrue) === ((8L, 6L, 4L, 12L)))
    assert(nHat === round4(9.0 * 7 / 5 - 1))
    val varHat = 9.0 * 7 * (8 - 4) * (6 - 4) / (25.0 * 6)
    assert(lo === round4(11.6 - 1.959964 * math.sqrt(varHat)))
    assert(hi === round4(11.6 + 1.959964 * math.sqrt(varHat)))
  }

  test("exact re-crawl duplicates collapse to one marked individual") {
    // ids 1 and 5 carry the SAME text: one individual seen in both
    // snapshots (both odd, both %3!=0) -> counts drop by one each
    val docs = Seq(1L -> "same text", 5L -> "same text",
      2L -> "other a", 7L -> "other b")
    val (n1, n2, m, nTrue, _, _, _) = run(docs)
    assert(nTrue === 3L)
    assert((n1, n2, m) === ((3L, 2L, 2L)))
  }

  test("disjoint snapshots: m = 0 stays defined (Chapman's +1)") {
    // id 3 (B only: odd, %3=0), id 2 (A only: even, %3!=0)
    val (n1, n2, m, _, nHat, _, _) =
      run(Seq(3L -> "only b", 2L -> "only a"))
    assert((n1, n2, m) === ((1L, 1L, 0L)))
    assert(nHat === round4(2.0 * 2 / 1 - 1))
  }
}
