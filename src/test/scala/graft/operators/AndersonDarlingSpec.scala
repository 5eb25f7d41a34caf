package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[AndersonDarling]] (X250) oracles: a hand-checkable discrete A² on
  * a tiny fixture, a brute-force replay on a tied fixture, separated
  * arms crossing the asymptotic 2.492 bar, and the empty-arm NULL.
  */
class AndersonDarlingSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Double)]) // (user, value)
      : (Long, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("ad")
    obs.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, new Timestamp(86400000L * 19000 + i * 1000L), u,
        "et", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = AndersonDarling.q278.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getBoolean(3)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force replay of the operator's discrete right-continuous
    * form: distinct pooled values, plus-block cumulatives, terms for
    * B < N only, A² = (Σa/nₐ + Σb/n_b)/N.
    */
  private def replay(obs: Seq[(Long, Double)]): Double = {
    val a = obs.filter(_._1 % 2 == 0).map(_._2)
    val b = obs.filter(_._1 % 2 == 1).map(_._2)
    val (na, nb) = (a.size.toLong, b.size.toLong)
    val nn = na + nb
    val values = (a ++ b).distinct.sorted
    var (ma, mb, bb) = (0L, 0L, 0L)
    var (sa, sb) = (BigDecimal(0), BigDecimal(0))
    for (v <- values) {
      val ta = a.count(_ == v).toLong
      val tb = b.count(_ == v).toLong
      ma += ta; mb += tb; bb += ta + tb
      if (bb < nn) {
        def term(m: Long, narm: Long): Double = {
          val diff = nn.toDouble * m.toDouble -
            narm.toDouble * bb.toDouble
          (ta + tb).toDouble * diff * diff /
            (bb.toDouble * (nn - bb).toDouble)
        }
        sa += BigDecimal(term(ma, na)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)
        sb += BigDecimal(term(mb, nb)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)
      }
    }
    round6((sa.toDouble / na + sb.toDouble / nb) / nn)
  }

  test("hand fixture {1,3} vs {2,4}: every block's term by hand") {
    // pooled 1,2,3,4; N=4, na=nb=2. Blocks (B<4): B=1,2,3
    //  v=1: Ma=1 Mb=0, diff_a = 4*1-2*1 = 2, term_a = 4/3; diff_b=-2
    //  v=2: Ma=1 Mb=1, B=2: diff = 4-4 = 0 both
    //  v=3: Ma=2 Mb=1, B=3: diff_a = 8-6 = 2, term_a = 4/3; diff_b=-2
    // sa = sb = 8/3; A² = (8/6 + 8/6)/4 = 2/3
    val obs = Seq((0L, 1.0), (0L, 3.0), (1L, 2.0), (1L, 4.0))
    val (na, nb, a2, sig) = run(obs)
    assert((na, nb) === ((2L, 2L)))
    assert(a2 === Some(round6(2.0 / 3.0)))
    assert(sig === Some(false))
    assert(replay(obs) === round6(2.0 / 3.0))
  }

  test("ties across arms: the plus-block fold matches the replay") {
    val obs = Seq((0L, 1.0), (0L, 2.0), (0L, 2.0), (1L, 2.0),
      (1L, 3.0), (1L, 3.0), (0L, 4.0), (1L, 4.0))
    val (_, _, a2, _) = run(obs)
    assert(a2 === Some(replay(obs)))
  }

  test("well-separated arms cross the 2.492 asymptotic bar") {
    val obs = (1 to 30).map(i => (0L, i.toDouble)) ++
      (1 to 30).map(i => (1L, 100.0 + i))
    val (_, _, a2, sig) = run(obs)
    assert(a2 === Some(replay(obs)))
    assert(sig === Some(true))
  }

  test("identical arms: A² stays under the bar") {
    val obs = (1 to 20).flatMap(i =>
      Seq((0L, i.toDouble), (1L, i.toDouble)))
    val (_, _, a2, sig) = run(obs)
    assert(a2 === Some(replay(obs)))
    assert(sig === Some(false))
  }

  test("one empty arm: NULL statistic") {
    val (na, nb, a2, sig) = run(Seq((0L, 1.0), (0L, 2.0)))
    assert(na === 2L && nb === 0L && a2 === None && sig === None)
  }
}
