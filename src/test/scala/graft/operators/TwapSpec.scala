package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Twap]] (X160) oracles: a planted path where the event mean and
  * the time-weighted mean disagree (the chatty-sensor point), the
  * single-event NULL contract, and sf0.001 ≡ a µs-exact driver replay
  * of the LOCF integral.
  */
class TwapSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(m: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$sec%02d")

  private def run(rows: Seq[(Long, Timestamp, String, Double)]) = {
    val dir = tmpDir("twap")
    rows.toDF("event_id", "ts", "event_type", "value")
      .selectExpr("event_id", "ts", "cast(event_id as long) as user_id",
        "event_type", "value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Twap.q200.build(spark, dir).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("day")) -> r).toMap
  }

  test("a value held 9 minutes dominates the TWAP even when 10 quick " +
      "ticks at another level dominate the event mean") {
    // 10.0 held from 10:00 to 10:09 (540 s), then ten 1-second ticks
    // at 1.0 — event mean (10+10)/11 = 1.818..., TWAP ≈ 9.836
    val rows = (Seq((1L, ts(0), "a", 10.0)) ++
      (0 until 10).map(i => (2L + i, ts(9, i), "a", 1.0))).map {
      case (id, t, g, v) => (id.toLong, t, g, v)
    }
    val r = run(rows)(("a", "2024-01-01"))
    val integral = 10.0 * 100 * 540e6 + (1.0 * 100 * 1e6) * 9
    val span = 549e6
    assert(r.getAs[Double]("integral_centi_us") === integral)
    assert(r.getAs[Long]("span_us") === span.toLong)
    assert(r.getAs[Double]("twap") === integral / span / 100.0)
    assert(math.abs(r.getAs[Double]("twap") - 9.852) < 0.01)
    assert(math.abs(r.getAs[Double]("event_mean") - 20.0 / 11) < 1e-12)
  }

  test("single-event day: span 0, twap NULL (stated contract)") {
    val r = run(Seq((1L, ts(0), "solo", 5.0)))(("solo", "2024-01-01"))
    assert(r.getAs[Long]("span_us") === 0L)
    assert(r.isNullAt(r.fieldIndex("twap")))
    assert(r.getAs[Double]("event_mean") === 5.0)
  }

  test("q200 at sf0.001 == µs-exact driver replay") {
    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "ts", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as v_centi")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3)))
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val expected = events
      .groupBy(e => (e._1, fmt.format(e._2))).map { case ((g, day), rs) =>
        val ordered = rs.sortBy(e => (micros(e._2), e._3))
        val us = ordered.map(e => micros(e._2))
        val integral = ordered.zip(ordered.tail).map { case (a, b) =>
          BigInt(a._4) * BigInt(micros(b._2) - micros(a._2))
        }.sum
        val span = us.max - us.min
        val twap = if (span > 0)
          Some(integral.toDouble / span.toDouble / 100.0) else None
        (g, day) -> ((ordered.length.toLong, span,
          integral.toDouble, twap))
      }
    val got = Twap.q200.build(spark, sf0001).collect().map { r =>
      (r.getAs[String]("g"), r.getAs[String]("day")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("span_us"),
          r.getAs[Double]("integral_centi_us"),
          Option(r.getAs[Any]("twap")).map(_.asInstanceOf[Double])))
    }.toMap
    assert(got === expected.toMap)
  }
}
