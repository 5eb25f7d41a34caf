package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MaxDrawdown]] (X152) oracles: a planted path with two drawdowns
  * where only the ORDER distinguishes the deeper one (the min/max pair
  * the operator exists to beat would get it wrong), a monotone series
  * (drawdown 0, trough = first row), an argmax tie broken by time,
  * and the sf0.001 events ≡ a literal driver replay.
  */
class MaxDrawdownSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private def run(rows: Seq[(Long, Timestamp, String, Double)])
      : Map[String, (Long, Double, Double, Double, Timestamp, Long)] = {
    val dir = tmpDir("mdd")
    rows.toDF("event_id", "ts", "event_type", "value")
      .selectExpr("event_id", "ts", "cast(event_id as long) as user_id",
        "event_type", "value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    MaxDrawdown.q193.build(spark, dir).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_events"),
        r.getAs[Double]("final_equity"), r.getAs[Double]("max_drawdown"),
        r.getAs[Double]("peak_equity"), r.getAs[Timestamp]("trough_ts"),
        r.getAs[Long]("trough_event")))
    }.toMap
  }

  test("order decides: +10 −4 +1 −5 has max drawdown 8 (peak 10 at " +
      "t0 to trough 2 at t3), not the −5 final dip alone") {
    val rows = Seq(
      (1L, ts(0), "a", 10.0), (2L, ts(1), "a", -4.0),
      (3L, ts(2), "a", 1.0), (4L, ts(3), "a", -5.0))
    val (n, fin, dd, peak, tts, tev) = run(rows)("a")
    assert(n === 4L && fin === 2.0)
    assert(dd === 8.0 && peak === 10.0,
      "path 10,6,7,2: deepest fall is 10→2 = 8")
    assert(tts === ts(3) && tev === 4L)
  }

  test("monotone rising series: drawdown 0, trough pinned to the " +
      "FIRST row by the (dd desc, ts, event_id) total order") {
    val rows = Seq((1L, ts(0), "m", 1.0), (2L, ts(1), "m", 2.0),
      (3L, ts(2), "m", 3.0))
    val (_, fin, dd, peak, tts, tev) = run(rows)("m")
    assert(dd === 0.0 && fin === 6.0 && peak === 1.0)
    assert(tts === ts(0) && tev === 1L)
  }

  test("equal-depth drawdowns tie to the EARLIER trough") {
    // path: 5, 1, 5, 1 — two drawdowns of 4; earlier trough (t1) wins
    val rows = Seq((1L, ts(0), "t", 5.0), (2L, ts(1), "t", -4.0),
      (3L, ts(2), "t", 4.0), (4L, ts(3), "t", -4.0))
    val (_, _, dd, _, tts, tev) = run(rows)("t")
    assert(dd === 4.0 && tts === ts(1) && tev === 2L)
  }

  test("q193 at sf0.001 == literal driver replay") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "ts", "event_id",
        "cast(cast(value as decimal(18,2)) as string) as v")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        BigDecimal(r.getString(3))))
    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val expected = events.groupBy(_._1).map { case (g, rows) =>
      val ordered = rows.sortBy(r => (micros(r._2), r._3))
      var p = BigDecimal(0); var m: BigDecimal = null
      val scored = ordered.map { case (_, t, id, v) =>
        p += v; if (m == null || p > m) m = p
        (t, id, p, m, m - p)
      }
      val trough = scored.minBy { case (t, id, _, _, dd) =>
        (-dd, micros(t), id)
      }
      g -> ((ordered.length.toLong, p.toDouble, trough._5.toDouble,
        trough._4.toDouble, trough._1, trough._2))
    }
    val got = MaxDrawdown.q193.build(spark, sf0001).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_events"),
        r.getAs[Double]("final_equity"), r.getAs[Double]("max_drawdown"),
        r.getAs[Double]("peak_equity"), r.getAs[Timestamp]("trough_ts"),
        r.getAs[Long]("trough_event")))
    }.toMap
    assert(got === expected)
  }
}
