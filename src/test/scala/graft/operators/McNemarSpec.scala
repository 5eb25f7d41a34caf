package graft.operators

import graft.SparkSpec

/** [[McNemar]] (X216) oracles: planted documents landing in every
  * agreement cell, the continuity-corrected χ², and the
  * no-discordance NULL.
  */
class McNemarSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String])
      : (Long, Long, Long, Long, Long, Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("mcn")
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = McNemar.q249.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      if (r.isNullAt(6)) None else Some(r.getBoolean(6)))
  }

  private def words(n: Int): String = Seq.fill(n)("word").mkString(" ")

  test("every cell reachable; chi2 matches (|b-c|-1)^2/(b+c)") {
    // both: 40 clean words (quality 0.8, rule passes)
    // only_a: 40 words + heavy punctuation (punct ~0.2: quality
    //   0.8*0.8 = 0.64 >= 0.5 but rule fails on punct)
    // only_b: 22 clean words (quality 0.44 < 0.5, rule passes)
    // neither: 5 words (quality 0.1, rule fails)
    val both = words(40)
    val onlyA = words(40) + " " + Seq.fill(12)("!!!!").mkString(" ")
    val onlyB = words(22)
    val neither = words(5)
    val out = run(Seq(both, onlyA, onlyA, onlyA, onlyB, neither))
    assert((out._1, out._2, out._3, out._4, out._5) ===
      ((6L, 1L, 3L, 1L, 1L)))
    // b = 3, c = 1: chi2 = (|3-1|-1)^2 / 4 = 0.25, not asymmetric
    assert(out._6 === Some(0.25))
    assert(out._7 === Some(false))
  }

  test("no discordant pairs: chi2 NULL") {
    val out = run(Seq(words(40), words(40), words(5)))
    assert((out._3, out._4) === ((0L, 0L)))
    assert(out._6 === None && out._7 === None)
  }
}
