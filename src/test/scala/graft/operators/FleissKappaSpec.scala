package graft.operators

import graft.SparkSpec

/** [[FleissKappa]] (X227) oracles: the hand-computed κ = −1/8 on the
  * q258 planted battery, perfect agreement κ = 1, and the P̄_e = 1
  * degenerate NULL.
  */
class FleissKappaSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String])
      : (Long, Long, Option[Double], Double, Double) = {
    val dir = tmpDir("fk")
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = FleissKappa.q259.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getDouble(3), r.getDouble(4))
  }

  private def words(n: Int, w: String = "word"): String =
    Seq.fill(n)(w).mkString(" ")

  test("hand-planted ballots (r = 3,2,2,1): kappa = -0.125") {
    // same gate patterns as CochranQSpec: A=12, S=8, n=4
    // p_bar = 12/24 = 0.5; p_e = (64+16)/144 = 5/9; kappa = -1/8
    val (n, s, kappa, pBar, pE) = run(Seq(
      words(40), words(40, "ab"), words(22), words(5)))
    assert((n, s) === ((4L, 8L)))
    assert(pBar === 0.5)
    assert(pE === BigDecimal(5.0 / 9.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(kappa === Some(-0.125))
  }

  test("unanimous but MIXED ballots: perfect agreement, kappa = 1") {
    // one all-pass doc and one all-fail doc: every rater agrees on
    // every doc, and both categories occur, so p_e < 1
    val (_, _, kappa, pBar, _) = run(Seq(words(40), "!! !! !!"))
    assert(pBar === 1.0)
    assert(kappa === Some(1.0))
  }

  test("every ballot identical on every doc: p_e = 1 -> NULL") {
    val (_, _, kappa, _, pE) = run(Seq(words(40), words(50)))
    assert(pE === 1.0 && kappa === None)
  }
}
