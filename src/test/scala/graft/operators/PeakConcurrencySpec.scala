package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PeakConcurrency]] (X157) oracles: planted sessions where the
  * count-per-hour view and the true overlap disagree (sequential vs
  * simultaneous), boundary inclusivity (a session ending exactly when
  * another starts counts as overlap), earliest-peak tie-break, and
  * sf0.001 ≡ a literal driver sweep replay over q35's session cut.
  */
class PeakConcurrencySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def run(rows: Seq[(Long, Timestamp, Long)])
      : (Long, Long, Timestamp) = {
    val dir = tmpDir("conc")
    rows.toDF("event_id", "ts", "user_id")
      .selectExpr("event_id", "ts", "user_id", "'a' as event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PeakConcurrency.q198.build(spark, dir).collect()
    assert(r.length === 1)
    (r(0).getAs[Long]("n_sessions"), r(0).getAs[Long]("peak_concurrency"),
      r(0).getAs[Timestamp]("peak_ts"))
  }

  test("three overlapping single-user sessions peak at 3; three " +
      "sequential ones peak at 1") {
    // users 1..3 each active 10:00-10:20 (one session each)
    val overlap = Seq(
      (1L, ts(10, 0), 1L), (2L, ts(10, 20), 1L),
      (3L, ts(10, 5), 2L), (4L, ts(10, 20), 2L),
      (5L, ts(10, 10), 3L), (6L, ts(10, 20), 3L))
    assert(run(overlap) === ((3L, 3L, ts(10, 10))))
    // same users, sessions in different hours
    val sequential = Seq(
      (1L, ts(9, 0), 1L), (2L, ts(9, 10), 1L),
      (3L, ts(11, 0), 2L), (4L, ts(11, 10), 2L),
      (5L, ts(13, 0), 3L), (6L, ts(13, 10), 3L))
    val (n, peak, at) = run(sequential)
    assert(n === 3L && peak === 1L && at === ts(9, 0),
      "peak 1 — ties resolve to the EARLIEST instant")
  }

  test("boundary inclusivity: one session ends exactly when another " +
      "starts — that instant counts 2") {
    val rows = Seq(
      (1L, ts(10, 0), 1L), (2L, ts(10, 30), 1L),
      (3L, ts(10, 30), 2L), (4L, ts(10, 45), 2L))
    assert(run(rows) === ((2L, 2L, ts(10, 30))))
  }

  /** Microsecond-exact epoch (Timestamp.getTime is ms-truncated). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("q198 at sf0.001 == literal driver sweep replay") {
    val events = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val sessions = events.groupBy(_._1).flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (micros(r._2), r._3))
      var sid = 0L
      var prev: Timestamp = null
      ordered.map { case (_, t, _) =>
        // mirror the query's cast-to-double seconds arithmetic exactly
        if (prev == null ||
          micros(t) / 1e6 - micros(prev) / 1e6 > 1800d) sid += 1
        prev = t
        (u, sid, t)
      }.groupBy(_._2).map { case (s, es) =>
        (u, s, es.map(_._3).minBy(micros), es.map(_._3).maxBy(micros))
      }
    }.toSeq
    val deltas = sessions.flatMap { case (u, s, a, b) =>
      Seq((a, 1L, u, s), (b, -1L, u, s))
    }.sortBy { case (at, delta, u, s) => (micros(at), -delta, u, s) }
    var conc = 0L
    val swept = deltas.map { case (at, delta, u, s) =>
      conc += delta; (at, conc, u, s)
    }
    val (pAt, pConc, _, _) = swept.minBy { case (at, c, u, s) =>
      (-c, micros(at), u, s)
    }
    val got = PeakConcurrency.q198.build(spark, sf0001).collect()(0)
    assert(got.getAs[Long]("n_sessions") === sessions.length.toLong)
    assert(got.getAs[Long]("peak_concurrency") === pConc)
    assert(got.getAs[Timestamp]("peak_ts") === pAt)
  }
}
