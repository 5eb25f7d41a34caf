package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ChangePoint]] (X143) oracles: a planted level shift localizes to
  * the last pre-shift hour with the hand-computed CUSUM maximum, a
  * flat series reports zero signal, and the full sf0.001 events table
  * matches a literal driver-side replay of the integer recursion.
  */
class ChangePointSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double, String)])
      : Map[String, (Long, Long, Long, Timestamp)] = {
    val dir = tmpDir("cusum")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ChangePoint.q184.build(spark, dir).collect().map(r =>
      r.getAs[String]("g") -> (r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Long]("max_cusum"),
        r.getAs[Timestamp]("change_hour"))).toMap
  }

  private def hourTs(h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")

  /** The query reports the TRUNCATED hour bucket. */
  private def hourBucket(h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("planted level shift: 10 hours of 2 then 10 hours of 6 → " +
      "change at the last pre-shift hour, max_cusum = hand-computed " +
      "400; a flat series reports 0") {
    var id = 0L
    def events(g: String, hour: Int, n: Int) = (1 to n).map { _ =>
      id += 1; (id, hourTs(hour), 1L, g, 1.0, "{}")
    }
    val shifted = (0 until 10).flatMap(h => events("shift", h, 2)) ++
      (10 until 20).flatMap(h => events("shift", h, 6))
    val flat = (0 until 20).flatMap(h => events("flat", h, 3))
    val out = run(shifted ++ flat)
    // shift: H=20, T=80; d = 20x-80 = -40 pre, +40 post; prefix min
    // -400 at hour 9 (the last pre-shift hour); max cusum = 0-(-400)
    assert(out("shift") === ((20L, 80L, 400L, hourBucket(9))))
    // flat: d = 0 everywhere → max cusum 0, change hour = first (tie)
    assert(out("flat") === ((20L, 60L, 0L, hourBucket(0))))
  }

  test("q184 at sf0.001 == literal driver replay of Page's recursion") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "date_trunc('hour', ts) AS h")
      .collect().map(r => (r.getString(0), r.getTimestamp(1)))
    val expected = ev.groupBy(_._1).map { case (g, rows) =>
      val hourly = rows.groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1.getTime)
      val hh = hourly.size.toLong
      val tt = hourly.map(_._2).sum
      // the classic sequential form: s_t = max(0, s_{t-1} + d_t)
      var s = 0L; var maxS = 0L
      hourly.foreach { case (_, x) =>
        s = math.max(0L, s + (x * hh - tt)); maxS = math.max(maxS, s)
      }
      // change hour = earliest hour attaining the global prefix min
      val ps = hourly.scanLeft(0L) { case (p, (_, x)) =>
        p + (x * hh - tt)
      }.tail
      val minH = hourly(ps.indexOf(ps.min))._1
      g -> ((hh, tt, maxS, minH))
    }
    val got = ChangePoint.q184.build(spark, sf0001).collect().map(r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Long]("max_cusum"),
        r.getAs[Timestamp]("change_hour")))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, e) => assert(got(g) === e, s"type $g") }
  }
}
