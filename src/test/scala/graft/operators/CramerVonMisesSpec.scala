package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[CramerVonMises]] (X237) oracles: Anderson's textbook T on a tiny
  * interleaved fixture, a brute-force midrank replay on a tied
  * fixture, identical arms scoring the minimum, and the empty-arm
  * NULL.
  */
class CramerVonMisesSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Double)]) // (user, value)
      : (Long, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("cvm")
    obs.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, new Timestamp(86400000L * 19000 + i * 1000L), u,
        "et", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = CramerVonMises.q269.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getBoolean(3)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force replay of the operator's convention: combined
    * MIDRANKS for r (ties share the block's average rank), consecutive
    * own-sample POSITIONS 1..n for i (Anderson's i/j are positions;
    * a tie block's members occupy consecutive positions), then
    * T = U/(nmN) − (4nm−1)/(6N).
    */
  private def replay(obs: Seq[(Long, Double)]): Double = {
    val a = obs.filter(_._1 % 2 == 0).map(_._2).sorted
    val b = obs.filter(_._1 % 2 == 1).map(_._2).sorted
    val all = (a ++ b).sorted
    def sumSq(own: Seq[Double]): Double =
      own.zipWithIndex.map { case (v, idx) =>
        val r = all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
        math.pow(r - (idx + 1), 2)
      }.sum
    val (n, m) = (a.size.toDouble, b.size.toDouble)
    val nn = n + m
    round6((n * sumSq(a) + m * sumSq(b)) / (n * m * nn) -
      (4 * n * m - 1) / (6 * nn))
  }

  test("Anderson fixture {1,3} vs {2,4}: T = 0.125") {
    val obs = Seq((0L, 1.0), (0L, 3.0), (1L, 2.0), (1L, 4.0))
    val (na, nb, t, sig) = run(obs)
    assert((na, nb) === ((2L, 2L)))
    assert(t === Some(0.125))
    assert(sig === Some(false))
    assert(replay(obs) === 0.125)
  }

  test("ties across arms: the doubled-midrank fold matches the replay") {
    val obs = Seq((0L, 1.0), (0L, 2.0), (0L, 2.0), (1L, 2.0),
      (1L, 3.0), (1L, 3.0), (0L, 4.0), (1L, 4.0))
    val (_, _, t, _) = run(obs)
    assert(t === Some(replay(obs)))
  }

  test("well-separated arms cross the 0.461 asymptotic bar") {
    val obs = (1 to 30).map(i => (0L, i.toDouble)) ++
      (1 to 30).map(i => (1L, 100.0 + i))
    val (_, _, t, sig) = run(obs)
    assert(t === Some(replay(obs)))
    assert(sig === Some(true))
  }

  test("one empty arm: NULL statistic") {
    val (na, nb, t, sig) = run(Seq((0L, 1.0), (0L, 2.0)))
    assert(na === 2L && nb === 0L && t === None && sig === None)
  }

}
