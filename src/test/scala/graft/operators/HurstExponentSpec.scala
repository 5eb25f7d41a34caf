package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[HurstExponent]] (X248) oracles: a brute-force R/S replay on a
  * planted 64-hour series, the persistent-vs-alternating H ordering,
  * and the short-series NULL (missing block sizes).
  */
class HurstExponentSpec extends SparkSpec {
  import spark.implicits._

  private def run(series: Map[String, Seq[Int]])
      : Map[String, (Long, Option[Double], Option[Boolean])] = {
    val dir = tmpDir("hurst")
    val rows = for {
      (et, counts) <- series.toSeq
      (c, h) <- counts.zipWithIndex
      k <- 0 until c
    } yield (h.toLong * 1000 + k,
      new Timestamp((700000L + h) * 3600000L + k * 1000L),
      k.toLong, et, 1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    HurstExponent.q275.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force replay: complete disjoint blocks per size, exact
    * integer B·Wⱼ range and B·Σx²−P² variance, decimal-lane mean R/S,
    * fixed ln-weights (−1.5,−0.5,0.5,1.5)/(5·ln 2).
    */
  private def replay(xs: Seq[Int]): Option[Double] = {
    val sizes = Seq(8, 16, 32, 64)
    val ln2 = math.log(2.0)
    val weights = Map(8 -> (-1.5 / (5 * ln2)), 16 -> (-0.5 / (5 * ln2)),
      32 -> (0.5 / (5 * ln2)), 64 -> (1.5 / (5 * ln2)))
    val perSize = sizes.flatMap { b =>
      val rss = xs.grouped(b).filter(_.size == b).toSeq.flatMap { blk =>
        val pb = blk.map(_.toLong).sum
        val sxx = blk.map(x => x.toLong * x).sum
        val dvar = b.toLong * sxx - pb * pb
        if (dvar <= 0) None
        else {
          val prefixes = blk.scanLeft(0L)(_ + _).tail
          val qs = prefixes.zipWithIndex.map { case (p, j) =>
            b.toLong * p - (j + 1).toLong * pb
          }
          Some((qs.max - qs.min).toDouble / math.sqrt(dvar.toDouble))
        }
      }
      if (rss.isEmpty) None
      else {
        val meanRs = rss.map(r => BigDecimal(r).setScale(14,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / rss.size
        Some(b -> meanRs)
      }
    }
    if (perSize.size != 4) None
    else Some(round6(perSize.map { case (b, m) =>
      BigDecimal(weights(b) * math.log(m)).setScale(14,
        BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble))
  }

  test("H matches the replay on a 64-hour planted series") {
    // a persistent-ish sawtooth with long excursions
    val xs = (0 until 64).map(h => 10 + (h / 8) * 3 + (h % 5))
    val out = run(Map("et" -> xs))
    assert(out("et")._1 === 4L)
    assert(out("et")._2 === replay(xs))
  }

  test("trending load reads more persistent than strict alternation") {
    val trend = (0 until 64).map(h => 5 + h)
    val alt = (0 until 64).map(h => if (h % 2 == 0) 10 else 2)
    val out = run(Map("trend" -> trend, "alt" -> alt))
    assert(out("trend")._2 === replay(trend))
    assert(out("alt")._2 === replay(alt))
    assert(out("trend")._2.get > out("alt")._2.get)
    assert(out("trend")._3 === Some(true))
  }

  test("under 64 observed hours: missing the 64-block, NULL H") {
    val xs = (0 until 40).map(h => 5 + (h % 7))
    val out = run(Map("short" -> xs))
    assert(out("short")._1 === 3L)
    assert(out("short")._2 === None)
  }
}
