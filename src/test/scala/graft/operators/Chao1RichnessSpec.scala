package graft.operators

import graft.SparkSpec

/** [[Chao1Richness]] (X220) oracles: the textbook Chao1 and coverage
  * on a planted token census, and the no-singletons saturation case.
  */
class Chao1RichnessSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(String, String)])
      : Map[String, (Long, Long, Long, Long, Double, Double)] = {
    val dir = tmpDir("chao")
    docs.zipWithIndex.map { case ((src, text), i) =>
      (i.toLong, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Chao1Richness.q253.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    }.toMap
  }

  test("textbook census: a a b c -> D=3, f1=2, f2=1, chao1=3.5") {
    val out = run(Seq("s0" -> "a a b c"))
    assert(out("s0") === ((4L, 3L, 2L, 1L, 3.5d, 0.5d)))
  }

  test("no singletons: chao1 = D, coverage 1") {
    val out = run(Seq("s0" -> "a a b b", "s1" -> "x y"))
    // s0: f1=0 -> chao1 = 2 + 0 = 2, coverage 1
    assert(out("s0") === ((4L, 2L, 0L, 2L, 2.0d, 1.0d)))
    // s1: all singletons, f2=0 -> chao1 = 2 + 2*1/2 = 3, coverage 0
    assert(out("s1") === ((2L, 2L, 2L, 0L, 3.0d, 0.0d)))
  }
}
