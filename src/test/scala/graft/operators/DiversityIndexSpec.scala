package graft.operators

import graft.SparkSpec

/** [[DiversityIndex]] (X221) oracles: hand-computed Simpson/Shannon/
  * Pielou on planted censuses, including maximal evenness and the
  * single-type degenerate.
  */
class DiversityIndexSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(String, String)])
      : Map[String, (Long, Long, Option[Double], Double,
        Option[Double])] = {
    val dir = tmpDir("div")
    docs.zipWithIndex.map { case ((lang, text), i) =>
      (i.toLong, text, lang, "s0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    DiversityIndex.q254.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("a a b b: lambda = 1/3, H = ln 2, evenness = 1") {
    val out = run(Seq("en" -> "a a b b"))
    val (n, v, simp, h, j) = out("en")
    assert((n, v) === ((4L, 2L)))
    assert(simp === Some(0.333333))
    assert(h === round6(math.log(2.0)))
    assert(j === Some(1.0))
  }

  test("single type: lambda = 1, H = 0, evenness NULL") {
    val out = run(Seq("en" -> "a a a"))
    val (_, v, simp, h, j) = out("en")
    assert(v === 1L && simp === Some(1.0) && h == 0.0 && j === None)
  }

  test("skewed census drops evenness below the uniform one") {
    val skew = run(Seq("en" -> "a a a a a a b c"))("en")
    val even = run(Seq("en" -> "a a b b c c d d"))("en")
    assert(skew._5.get < even._5.get)
    assert(skew._3.get > even._3.get, "Simpson concentration rises")
  }
}
