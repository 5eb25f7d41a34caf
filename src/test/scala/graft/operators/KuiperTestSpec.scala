package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[KuiperTest]] (X258) oracles: hand V on the interleaved fixture,
  * the both-tails case where V = D⁺ + D⁻ beats the single KS gap,
  * separated arms crossing the 1.747 bar, and the empty-arm NULL.
  */
class KuiperTestSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Double)])
      : (Long, Long, Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("kuiper")
    obs.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, new Timestamp(86400000L * 19000 + i * 1000L), u,
        "et", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = KuiperTest.q289.build(spark, dir).collect()(0)
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), d(2), d(3),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force D⁺ + D⁻ over the pooled distinct values. */
  private def replay(obs: Seq[(Long, Double)]): (Double, Double) = {
    val a = obs.filter(_._1 % 2 == 0).map(_._2)
    val b = obs.filter(_._1 % 2 == 1).map(_._2)
    val gaps = (a ++ b).distinct.sorted.map { v =>
      a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size
    }
    val dplus = math.max(gaps.max, 0L)
    val dminus = math.max(-gaps.min, 0L)
    val vstat = (dplus + dminus).toDouble / (a.size.toLong * b.size)
    val ne = a.size.toDouble * b.size / (a.size + b.size)
    (round6(vstat),
      round6(vstat * (math.sqrt(ne) + 0.155 + 0.24 / math.sqrt(ne))))
  }

  test("hand fixture {1,3} vs {2,4}: V = 1/2, D⁻ = 0") {
    val obs = Seq((0L, 1.0), (0L, 3.0), (1L, 2.0), (1L, 4.0))
    val (na, nb, v, lam, sig) = run(obs)
    assert((na, nb) === ((2L, 2L)))
    assert(v === Some(0.5))
    assert((v, lam) === { val (rv, rl) = replay(obs)
      ((Some(rv), Some(rl))) })
    assert(sig === Some(false))
  }

  test("arm in both tails: V sums both excursions (beats the KS gap)") {
    // a = extremes, b = center: Fa leads early AND lags late
    val a = Seq(1.0, 2.0, 3.0, 21.0, 22.0, 23.0).map((0L, _))
    val b = Seq(11.0, 12.0, 13.0, 14.0, 15.0, 16.0).map((1L, _))
    val obs = a ++ b
    val (_, _, v, lam, _) = run(obs)
    val (rv, rl) = replay(obs)
    assert((v, lam) === ((Some(rv), Some(rl))))
    // D+ = D- = 1/2 here: V = 1 while the KS sup-gap is only 1/2
    assert(v === Some(1.0))
  }

  test("well-separated arms cross the 1.747 bar") {
    val obs = (1 to 12).map(i => (0L, i.toDouble)) ++
      (1 to 12).map(i => (1L, 100.0 + i))
    val (_, _, v, lam, sig) = run(obs)
    val (rv, rl) = replay(obs)
    assert((v, lam) === ((Some(rv), Some(rl))))
    assert(v === Some(1.0))
    assert(sig === Some(true))
  }

  test("identical arms: V = 0") {
    val obs = (1 to 10).flatMap(i =>
      Seq((0L, i.toDouble), (1L, i.toDouble)))
    val (_, _, v, _, sig) = run(obs)
    assert(v === Some(0.0))
    assert(sig === Some(false))
  }

  test("one empty arm: NULL") {
    val (_, _, v, _, sig) = run(Seq((0L, 1.0), (0L, 2.0)))
    assert(v === None && sig === None)
  }
}
