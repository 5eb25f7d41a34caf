package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[KaplanMeier]] (X256) oracles: hand product-limit values on a
  * censored fixture, the risk-set thinning convention, the absorbing
  * zero after the risk set empties, and the median-crossing flag.
  */
class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Int, String)])
      : Array[(Long, Long, Long, Long, Double, Boolean)] = {
    val dir = tmpDir("km")
    obs.zipWithIndex.map { case ((u, h, et), i) =>
      (i.toLong, new Timestamp((800000L + h) * 3600000L), u, et,
        1.0d, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    KaplanMeier.q287.build(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand curve with censoring thinning the risk set") {
    // even arm, 4 users: conversions at t=2 (u0), t=5 (u4);
    // u2 censored at t=3, u6 censored at t=9
    val obs = Seq[(Long, Int, String)](
      (0L, 0, "view"), (0L, 2, "purchase"),
      (2L, 0, "view"), (2L, 3, "view"),
      (4L, 0, "view"), (4L, 5, "purchase"),
      (6L, 0, "view"), (6L, 9, "view"))
    val out = run(obs).filter(_._1 == 0L)
    // t=2: r=4, d=1 -> S = 3/4; then u2 censored;
    // t=5: r=2, d=1 -> S = 3/4 * 1/2 = 3/8
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ===
      Seq((2L, 4L, 1L), (5L, 2L, 1L)))
    assert(out(0)._5 === 0.75)
    assert(out(1)._5 === round6(math.exp(
      math.log(0.75) + math.log(0.5))))
    // 0.375 <= 0.5 and previous 0.75 > 0.5: the median crossing
    assert(out.map(_._6).toSeq === Seq(false, true))
  }

  test("the curve hits exactly 0 when the last at-risk user converts") {
    val obs = Seq[(Long, Int, String)](
      (0L, 0, "view"), (0L, 1, "purchase"),
      (2L, 0, "view"), (2L, 4, "purchase"))
    val out = run(obs).filter(_._1 == 0L)
    // t=1: r=2 d=1 -> 0.5; t=4: r=1 d=1 -> absorbing 0
    assert(out.map(_._5).toSeq === Seq(0.5, 0.0))
    assert(out.map(_._6).toSeq === Seq(true, false))
  }

  test("arms are independent curves") {
    val obs = Seq[(Long, Int, String)](
      (0L, 0, "view"), (0L, 1, "purchase"),
      (2L, 0, "view"), (2L, 8, "view"),
      (1L, 0, "view"), (1L, 3, "purchase"))
    val out = run(obs)
    val arm0 = out.filter(_._1 == 0L)
    val arm1 = out.filter(_._1 == 1L)
    assert(arm0.map(r => (r._2, r._5)).toSeq === Seq((1L, 0.5)))
    assert(arm1.map(r => (r._2, r._5)).toSeq === Seq((3L, 0.0)))
  }
}
