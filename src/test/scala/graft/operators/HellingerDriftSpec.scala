package graft.operators

import graft.SparkSpec

/** [[HellingerDrift]] (X230) oracles: hand-computed BC/H on a planted
  * two-source corpus, H → 0 on identical distributions, and the
  * single-source NULL.
  */
class HellingerDriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(String, String)])
      : Map[String, (Long, Long, Option[Double], Option[Double])] = {
    val dir = tmpDir("hd")
    docs.zipWithIndex.map { case ((src, text), i) =>
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    HellingerDrift.q262.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("two skewed sources: BC and H match the hand formula") {
    // A: {x:2, y:1} of 3; rest-of-A = B = {x:1, y:2} of 3
    val out = run(Seq("a" -> "x x y", "b" -> "x y y"))
    val bcA = math.sqrt(2.0 / 3 * (1.0 / 3)) +
      math.sqrt(1.0 / 3 * (2.0 / 3))
    val (nTok, vocab, bc, h) = out("a")
    assert((nTok, vocab) === ((3L, 2L)))
    assert(bc === Some(round6(bcA)))
    assert(h === Some(round6(math.sqrt(math.max(0.0, 1.0 - bcA)))))
    // symmetric construction: b reads the same numbers
    assert(out("b")._3 === Some(round6(bcA)))
  }

  test("identical distributions: BC = 1, H = 0 (guarded sqrt)") {
    val out = run(Seq("a" -> "x y", "b" -> "x y"))
    assert(out("a")._3 === Some(1.0) && out("a")._4 === Some(0.0))
  }

  test("single source: no rest to compare against -> NULL") {
    val out = run(Seq("a" -> "x y z"))
    assert(out("a")._3 === None && out("a")._4 === None)
  }
}
