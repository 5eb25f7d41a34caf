package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[MarkovEntropy]] (X257) oracles: a deterministic chain scoring
  * H = 0 / predictability 1, a hand-computed mixed chain, the
  * single-state NULL, and the self-transition inclusion (unlike
  * q280's Bowker cells).
  */
class MarkovEntropySpec extends SparkSpec {
  import spark.implicits._

  private def run(chains: Map[Long, Seq[String]])
      : (Long, Long, Double, Double, Option[Double]) = {
    val dir = tmpDir("mkent")
    val rows = for {
      (u, types) <- chains.toSeq
      (et, i) <- types.zipWithIndex
    } yield (u * 1000 + i, new Timestamp((900000L + i) * 3600000L),
      u, et, 1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = MarkovEntropy.q288.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("deterministic alternation: H = 0, predictability 1") {
    val out = run(Map(1L -> Seq("a", "b", "a", "b", "a")))
    assert(out._1 === 4L && out._2 === 2L)
    assert(out._3 === 0.0)
    assert(out._5 === Some(1.0))
  }

  test("hand H on a mixed chain") {
    // from a: 2x to a, 2x to b (p = 1/2 each); from b: always to a
    val out = run(Map(1L -> Seq("a", "a", "b", "a", "a", "b", "a")))
    // cells: (a,a)=2 (a,b)=2 (b,a)=2; N=6, pi_a row = 4, pi_b row = 2
    // H = -( 2/6 ln(2/4) + 2/6 ln(2/4) + 2/6 ln(2/2) )
    val h = -(2.0 / 6 * math.log(0.5) * 2)
    assert(out._1 === 6L && out._2 === 2L)
    assert(out._3 === round6(h))
    assert(out._5 === Some(round6(1.0 - h / math.log(2.0))))
  }

  test("single state: H_max = 0, NULL predictability") {
    val out = run(Map(1L -> Seq("a", "a", "a")))
    assert(out._2 === 1L)
    assert(out._3 === 0.0)
    assert(out._5 === None)
  }

  test("chains do not cross users") {
    // two users, both a->b->a at the same hours: a cross-user chain
    // would invent extra transitions; per-user it stays deterministic
    val out = run(Map(1L -> Seq("a", "b", "a"),
      2L -> Seq("a", "b", "a")))
    assert(out._1 === 4L && out._2 === 2L)
    assert(out._3 === 0.0)
    assert(out._5 === Some(1.0))
  }
}
