package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[DurbinWatson]] (X247) oracles: the exact-integer DW replay on
  * planted hourly series, the ρ̂ ≈ 1 − DW/2 readout, the positive- and
  * negative-autocorrelation verdicts, and the constant-series NULL.
  */
class DurbinWatsonSpec extends SparkSpec {
  import spark.implicits._

  private def run(series: Map[String, Seq[Int]])
      : Map[String, (Long, Option[Double], Option[Double],
        Option[Boolean])] = {
    val dir = tmpDir("dw")
    val rows = for {
      (et, counts) <- series.toSeq
      (c, h) <- counts.zipWithIndex
      k <- 0 until c
    } yield (h.toLong * 100 + k,
      new Timestamp((600000L + h) * 3600000L + k * 1000L),
      k.toLong, et, 1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    DurbinWatson.q276.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** DW = n·Σ(Δx)² / (n·Σx² − Pₙ²), exact integers to one division. */
  private def replay(xs: Seq[Int]): Option[Double] = {
    val n = xs.size.toLong
    val pn = xs.map(_.toLong).sum
    val sxx = xs.map(x => x.toLong * x).sum
    val den = n * sxx - pn * pn
    if (den <= 0) None
    else {
      val num = xs.sliding(2).map { case Seq(a, b) =>
        val d = (b - a).toLong; d * d
      }.sum
      Some(round6(n.toDouble * num.toDouble / den.toDouble))
    }
  }

  test("DW matches the exact-integer replay; ρ̂ = 1 − DW/2") {
    val xs = Seq(3, 5, 4, 7, 6, 9, 8, 11, 10, 13)
    val out = run(Map("et" -> xs))
    val (n, dw, rho, _) = out("et")
    assert(n === 10L)
    assert(dw === replay(xs))
    assert(rho === Some(round6(1.0 - dw.get / 2.0)))
  }

  test("smooth ramp: DW near 0, positive autocorrelation flagged") {
    // a slow ramp's neighbours are maximally alike: Δx = 1 always
    val xs = (1 to 40).map(identity)
    val out = run(Map("ramp" -> xs))
    assert(out("ramp")._2 === replay(xs))
    assert(out("ramp")._2.get < 1.0)
    assert(out("ramp")._4 === Some(true))
  }

  test("strict alternation: DW near 4 (negative autocorrelation)") {
    val xs = (1 to 40).map(i => if (i % 2 == 0) 10 else 2)
    val out = run(Map("alt" -> xs))
    assert(out("alt")._2 === replay(xs))
    assert(out("alt")._2.get > 3.0)
    assert(out("alt")._4 === Some(true))
  }

  test("constant series: NULL DW") {
    val out = run(Map("const" -> Seq(7, 7, 7, 7, 7)))
    assert(out("const")._2 === None && out("const")._4 === None)
  }
}
