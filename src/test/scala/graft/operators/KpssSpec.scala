package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[Kpss]] (X246) oracles: a brute-force η replay on planted hourly
  * series, the wandering-vs-flat verdict split, and the
  * constant-series NULL.
  */
class KpssSpec extends SparkSpec {
  import spark.implicits._

  /** Plants `counts(h)` events in hour h for each series (type, counts). */
  private def run(series: Map[String, Seq[Int]])
      : Map[String, (Long, Option[Double], Option[Boolean])] = {
    val dir = tmpDir("kpss")
    val rows = for {
      (et, counts) <- series.toSeq
      (c, h) <- counts.zipWithIndex
      k <- 0 until c
    } yield (et.hashCode.toLong * 1000 + h * 10 + k,
      new Timestamp((500000L + h) * 3600000L + k * 1000L),
      k.toLong, et, 1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Kpss.q274.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** η = Σ(n·Pₜ − t·Pₙ)² / (n²·(n·Σx² − Pₙ²)), exact integers. */
  private def replay(xs: Seq[Int]): Option[Double] = {
    val n = xs.size.toLong
    val pn = xs.map(_.toLong).sum
    val sxx = xs.map(x => x.toLong * x).sum
    val dvar = n * sxx - pn * pn
    if (dvar <= 0) None
    else {
      val prefixes = xs.scanLeft(0L)(_ + _).tail
      val sq2 = prefixes.zipWithIndex.map { case (p, i) =>
        val q = BigDecimal(n * p - (i + 1).toLong * pn)
        q * q
      }.sum
      Some(round6(sq2.toDouble /
        (n.toDouble * n.toDouble * dvar.toDouble)))
    }
  }

  test("η matches the exact-integer replay on planted series") {
    val wander = Seq(1, 2, 3, 5, 8, 12, 17, 23, 30, 38) // level drifts
    val flat = Seq(5, 6, 5, 4, 5, 6, 5, 4, 5, 6)        // oscillates
    val out = run(Map("wander" -> wander, "flat" -> flat))
    assert(out("wander")._1 === 10L)
    assert(out("wander")._2 === replay(wander))
    assert(out("flat")._2 === replay(flat))
  }

  test("a long ramp is nonstationary; long oscillation is not") {
    val ramp = (1 to 50).map(i => i)
    val osc = (1 to 50).map(i => if (i % 2 == 0) 5 else 6)
    val out = run(Map("ramp" -> ramp, "osc" -> osc))
    assert(out("ramp")._2 === replay(ramp))
    assert(out("ramp")._3 === Some(true))
    assert(out("osc")._3 === Some(false))
  }

  test("constant series: zero variance, NULL η") {
    val out = run(Map("const" -> Seq(3, 3, 3, 3)))
    assert(out("const")._1 === 4L)
    assert(out("const")._2 === None)
  }
}
