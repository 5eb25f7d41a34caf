package graft.operators

import graft.SparkSpec

/** [[CochranQ]] (X226) oracles: a planted battery hitting distinct
  * gate patterns with the hand-computed Q, and the all-identical
  * degenerate NULL.
  */
class CochranQSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String])
      : (Long, Long, Long, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("cq")
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CochranQ.q258.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)),
      if (r.isNullAt(5)) None else Some(r.getBoolean(5)))
  }

  private def words(n: Int, w: String = "word"): String =
    Seq.fill(n)(w).mkString(" ")

  test("hand-planted patterns: Q = 12/18 on rows (TTT,TTF,FTT,FFT)") {
    // word len 4 -> gate_c true; "ab" len 2 -> packed 2n < 3n false
    val t1 = words(40) // quality .8 T, rule T, c T  -> r=3
    val t2 = words(40, "ab") // q .8 T, rule T, c F  -> r=2
    val t3 = words(22) // q .44 F, rule T, c T       -> r=2
    val t4 = words(5) // q .1 F, rule F, c T         -> r=1
    val (n, ca, cb, cc, q, sig) = run(Seq(t1, t2, t3, t4))
    assert((n, ca, cb, cc) === ((4L, 2L, 3L, 3L)))
    // S=8, S2=18: num = 2*((6-8)^2+(9-8)^2+(9-8)^2) = 12;
    // den = 3*(24-18) = 18
    assert(q === Some(BigDecimal(12.0 / 18.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(sig === Some(false))
  }

  test("all rows pass every gate: denominator 0 -> NULL verdict") {
    val (n, _, _, _, q, sig) = run(Seq(words(40), words(50)))
    assert(n === 2L && q === None && sig === None)
  }
}
