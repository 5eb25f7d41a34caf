package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[RunsTest]] (X215) oracles: hand-computed z on a planted clumped
  * series, the perfectly-alternating series, median-day exclusion,
  * and the one-sided degenerate NULL.
  */
class RunsTestSpec extends SparkSpec {
  import spark.implicits._

  private def run(series: Seq[(String, Int, Int)])
      : Map[String, (Long, Long, Long, Long, Option[Double],
        Option[Boolean])] = {
    val dir = tmpDir("rt")
    series.flatMap { case (ty, day, c) =>
      (0 until c).map { i =>
        ((day * 100000 + i).toLong,
          new Timestamp((19700L + day) * 86400000L + i * 1000L),
          i.toLong, ty, 1.0d, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    RunsTest.q248.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getBoolean(6))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("clumped series 1,1,1,9,9,9: R = 2, z matches the formula") {
    val out = run(Seq(1, 1, 1, 9, 9, 9).zipWithIndex.map {
      case (c, d) => ("aa", d, c)
    })
    val (nDays, n1, n2, r, z, _) = out("aa")
    // doubled median = 1 + 9 = 10; 3 above, 3 below, no exclusions
    assert((nDays, n1, n2, r) === ((6L, 3L, 3L, 2L)))
    val mu = 2.0 * 3 * 3 / 6.0 + 1.0
    val sig2 = (mu - 1.0) * (mu - 2.0) / 5.0
    assert(z === Some(round6((2.0 - mu) / math.sqrt(sig2))))
  }

  test("alternating series maximizes runs; median days are excluded") {
    // 1,9,1,9,1,9,5 -> doubled median = 5+5 = 10? n=7 days, sorted
    // 1,1,1,5,9,9,9: lo=hi=4th -> med2 = 10; day at 5 is excluded
    val out = run(Seq(1, 9, 1, 9, 1, 9, 5).zipWithIndex.map {
      case (c, d) => ("aa", d, c)
    })
    val (nDays, n1, n2, r, z, _) = out("aa")
    assert(nDays === 6L, "the median day must be excluded")
    assert((n1, n2) === ((3L, 3L)))
    assert(r === 6L, "strict alternation: every sided day starts a run")
    assert(z.isDefined && z.get > 0)
  }

  test("one-sided series (all equal but one): z is NULL") {
    // days: 5,5,5,9 -> med2 = 10, the three 5s are below, 9 above...
    // use 5,5,9: med2 = 5+5 = 10, 9 above, both 5s tie-excluded
    val out = run(Seq(5, 5, 9).zipWithIndex.map {
      case (c, d) => ("aa", d, c)
    })
    val (nDays, n1, n2, r, z, nr) = out("aa")
    assert((nDays, n1, n2, r) === ((1L, 1L, 0L, 1L)))
    assert(z === None && nr === None)
  }
}
