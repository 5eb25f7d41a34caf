package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[TukeyHsd]] (X254) oracles: the Tukey–Kramer threshold replay on
  * planted weekday volumes, the all-seven-dows gate, and the
  * equal-means fixture where nothing is significant.
  */
class TukeyHsdSpec extends SparkSpec {
  import spark.implicits._

  /** volumes(d) events on day d (hour 0), one event type. */
  private def run(volumes: Seq[Int]): Array[
    (Long, Long, Option[Double], Option[Boolean])] = {
    val dir = tmpDir("tukey")
    val rows = for {
      (x, day) <- volumes.zipWithIndex
      k <- 0 until x
    } yield (day.toLong * 1000 + k,
      new Timestamp((20000L + day) * 86400000L), k.toLong, "et",
      1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    TukeyHsd.q285.build(spark, dir).collect().map { r =>
      (r.getLong(1), r.getLong(2),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getBoolean(7)))
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Tukey–Kramer thresholds from the per-dow census. */
  private def replay(volumes: Seq[Int])
      : Map[(Long, Long), (Double, Boolean)] = {
    // the operator's dow is epoch-day mod 7; fixture days start at
    // epoch day 20000
    val byDow = volumes.zipWithIndex.groupBy(p => (p._2 + 20000) % 7)
      .map { case (dow, vs) => dow.toLong -> vs.map(_._1) }
    val n = volumes.size
    val ssw = byDow.values.map { g =>
      g.map(v => v.toDouble * v).sum -
        math.pow(g.map(_.toDouble).sum, 2) / g.size
    }.sum
    val msw = ssw / (n - 7)
    (for {
      a <- byDow.keys; b <- byDow.keys if a < b
    } yield {
      val (ga, gb) = (byDow(a), byDow(b))
      val diff = ga.map(_.toDouble).sum / ga.size -
        gb.map(_.toDouble).sum / gb.size
      val hsd = 4.17 * math.sqrt(msw / 2.0 *
        (1.0 / ga.size + 1.0 / gb.size))
      (a, b) -> ((round6(hsd), math.abs(diff) > hsd))
    }).toMap
  }

  test("one loud weekday: its pairs are significant, others are not") {
    // two weeks; dow 3 runs at 50, everything else near 10
    val volumes = (0 until 14).map(d =>
      if (d % 7 == 3) 50 else 10 + (d % 3))
    val out = run(volumes)
    assert(out.length === 21)
    val rep = replay(volumes)
    for ((da, db, hsd, sig) <- out) {
      assert(hsd === Some(rep((da, db))._1), s"pair $da-$db")
      assert(sig === Some(rep((da, db))._2), s"pair $da-$db")
    }
    // the loud fixture day (index % 7 == 3) lands on epoch dow 4
    assert(out.count { case (da, db, _, sig) =>
      (da == 4L || db == 4L) && sig.contains(true) } === 6)
  }

  test("equal dow means with within-dow spread: nothing significant") {
    // three weeks at 9/10/11: every dow mean is 10, MSW > 0
    val volumes = (0 until 21).map(d => 9 + d / 7)
    val out = run(volumes)
    assert(out.length === 21)
    assert(out.forall(_._4 === Some(false)))
  }

  test("a missing weekday withholds the verdict") {
    // only 6 distinct dows observed
    val volumes = (0 until 6).map(_ => 10)
    val out = run(volumes)
    assert(out.nonEmpty)
    assert(out.forall(r => r._3 === None && r._4 === None))
  }
}
