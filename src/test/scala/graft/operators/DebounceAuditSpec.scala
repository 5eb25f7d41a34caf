package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DebounceAudit]] (X179) oracles: the lag-chain contract (a burst
  * outlasting the window still counts every link ≤ 5 s), type/user
  * isolation, the inclusive 5 s boundary, worst-user tie-break, and
  * an sf0.001 driver replay.
  */
class DebounceAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(sec: Long): Timestamp =
    new Timestamp(1700000000000L + sec * 1000L)

  private def run(events: Seq[(Long, Long, String)])
      : Map[String, (Long, Long, Long, Long, Long, Double)] = {
    val df = events.zipWithIndex
      .map { case ((u, sec, ty), i) => (u, ts(sec), i.toLong, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    DebounceAudit.audit(df).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    }.toMap
  }

  test("lag chain: events at 0,5,10 s — the 10 s burst outlasts the " +
      "window but BOTH links are <= 5 s, so 2 bounces") {
    val out = run(Seq((1L, 0L, "A"), (1L, 5L, "A"), (1L, 10L, "A")))
    assert(out("A") === ((3L, 2L, 1L, 1L, 2L, 2.0 / 3.0)))
  }

  test("6 s gaps never bounce; the boundary 5 s gap does " +
      "(inclusive); other types and users do not chain") {
    val out = run(Seq(
      (1L, 0L, "A"), (1L, 6L, "A"), // 6 s: clean
      (1L, 100L, "B"), (1L, 105L, "B"), // 5 s: bounce
      (2L, 105L, "B"))) // other user, no predecessor
    assert(out("A")._2 === 0L)
    assert(out("B") === ((3L, 1L, 1L, 1L, 1L, 1.0 / 3.0)))
  }

  test("worst user: equal bounce counts tie to the smaller user id") {
    val out = run(Seq(
      (7L, 0L, "A"), (7L, 1L, "A"),
      (3L, 0L, "A"), (3L, 1L, "A")))
    assert(out("A")._4 === 3L) // worst_user
    assert(out("A")._5 === 1L) // worst_bounces
  }

  test("q217 at sf0.001 ≡ driver replay of the chain census") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val perUser = rows.groupBy(r => (r._1, r._4)).toSeq
      .map { case ((u, ty), es) =>
        val ordered = es.sortBy(e => (e._2.getTime, e._3))
        val bounces = ordered.zip(ordered.drop(1)).count { case (a, b) =>
          (b._2.getTime - a._2.getTime) / 1000.0 <= 5.0
        }
        (ty, u, es.size.toLong, bounces.toLong)
      }
    val expect = perUser.groupBy(_._1).map { case (ty, us) =>
      val worst = us.sortBy(x => (-x._4, x._2)).head
      ty -> ((us.map(_._3).sum, us.map(_._4).sum,
        us.count(_._4 > 0).toLong, worst._2, worst._4))
    }
    val got = DebounceAudit.q217.build(spark, sf0001).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, b, au, wu, wb) = expect(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === b &&
        r.getLong(3) === au && r.getLong(4) === wu &&
        r.getLong(5) === wb, r.getString(0))
    }
  }
}
