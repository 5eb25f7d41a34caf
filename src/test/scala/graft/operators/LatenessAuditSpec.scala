package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LatenessAudit]] (X138) oracles: hand-planted arrival sequences
  * produce exactly the expected lateness profile (first arrival is
  * never late, lateness measured against the running high-water mark,
  * types independent), and the full q179 at sf0.001 matches a
  * driver-side replay including the interpolated percentiles.
  */
class LatenessAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) = {
    val dir = tmpDir("lateness")
    rows.map { case (tpe, id, us) =>
      (1L, new java.sql.Timestamp(us / 1000L), id, tpe, 1.0, "p")
    }.toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    LatenessAudit.q179.build(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
  }

  test("planted arrivals: lateness vs the running high-water mark, " +
      "first event never late, types independent") {
    // type A arrival order (by event_id): t=100s, 50s, 200s, 150s, 90s
    val s = 1000000L // seconds → µs
    val out = run(Seq(
      ("A", 1L, 100 * s), ("A", 2L, 50 * s), ("A", 3L, 200 * s),
      ("A", 4L, 150 * s), ("A", 5L, 90 * s),
      ("B", 1L, 10 * s), ("B", 2L, 20 * s))) // in order: never late
    val a = out("A")
    // lateness: [0, 50s, 0, 50s, 110s]
    assert(a.getAs[Long]("n") === 5L)
    assert(a.getAs[Long]("n_late") === 3L)
    assert(a.getAs[Long]("max_late_us") === 110 * s)
    assert(a.getAs[Double]("p50_late_us") === 50.0 * s)
    assert(a.getAs[Long]("n_beyond_1m") === 1L, "110s > 1-minute watermark")
    val b = out("B")
    assert(b.getAs[Long]("n_late") === 0L)
    assert(b.getAs[Long]("max_late_us") === 0L)
    assert(b.getAs[Double]("late_share_r") === 0.0)
  }

  test("q179 at sf0.001 == driver-side replay (running max + " +
      "interpolated percentiles)") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("us")).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue,
        r.getLong(2)))
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val k = pos.toInt
      val g = pos - k
      if (k + 1 < s.length) (1 - g) * s(k) + g * s(k + 1)
      else s(k).toDouble
    }
    val got = LatenessAudit.q179.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val seq = ev.filter(_._1 == tpe).sortBy(_._2)
      var hwm = Long.MinValue
      val late = seq.map { case (_, _, us) =>
        val l = if (hwm == Long.MinValue) 0L else math.max(hwm - us, 0L)
        hwm = math.max(hwm, us)
        l
      }
      assert(r.getAs[Long]("n") === late.length.toLong)
      assert(r.getAs[Long]("n_late") === late.count(_ > 0).toLong)
      assert(r.getAs[Long]("max_late_us") === late.max)
      assert(math.abs(r.getAs[Double]("p50_late_us") -
        pct(late, 0.5)) < 1e-6, s"$tpe p50")
      assert(math.abs(r.getAs[Double]("p99_late_us") -
        pct(late, 0.99)) < 1e-6, s"$tpe p99")
    }
  }
}
