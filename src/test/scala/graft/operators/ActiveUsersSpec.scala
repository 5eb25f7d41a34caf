package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ActiveUsers]] (X190) oracles: the trailing windows are
  * inclusive-of-today ([d−6, d] / [d−29, d]), a user active twice in
  * a window counts once, the spine is observed days only, and
  * sf0.001 ≡ a driver replay of all three censuses.
  */
class ActiveUsersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(events: Seq[(Long, Int)]) // (user, dayOffset)
      : Seq[(Timestamp, Long, Long, Long, Double)] = {
    val dir = tmpDir("dauwau")
    events.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong,
        new Timestamp(1704067200000L + d.toLong * 86400000L + 3600000L),
        u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ActiveUsers.q227.build(spark, dir).collect().map { r =>
      (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    }.toSeq
  }

  test("user active on days 0 and 3: day 3 has dau 1, wau 1 (not 2 — " +
      "distinct), and day-0 activity leaves the WAU after day 6") {
    val out = run(Seq((1L, 0), (1L, 3), (2L, 0), (1L, 9)))
    val byDay = out.map(r => r._1.toString.take(10) -> r).toMap
    assert(byDay("2024-01-01")._2 === 2L) // dau day 0
    val d3 = byDay("2024-01-04")
    assert(d3._2 === 1L && d3._3 === 2L && d3._4 === 2L,
      "wau at day 3 sees users {1, 2}, user 1 once")
    val d9 = byDay("2024-01-10")
    assert(d9._3 === 1L, "day-0 and day-3 activity is outside [3,9]")
    assert(d9._4 === 2L, "MAU still sees both users")
    assert(d9._5 === 0.5)
  }

  test("q227 at sf0.001 ≡ driver replay of the three censuses") {
    val userDays = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0),
        Math.floorDiv(r.getTimestamp(1).getTime, 86400000L)))
      .distinct
    val days = userDays.map(_._2).distinct.sorted
    val expect = days.map { d =>
      val dau = userDays.count(_._2 == d).toLong
      val wau = userDays.filter(ud => ud._2 >= d - 6 && ud._2 <= d)
        .map(_._1).distinct.length.toLong
      val mau = userDays.filter(ud => ud._2 >= d - 29 && ud._2 <= d)
        .map(_._1).distinct.length.toLong
      (d, dau, wau, mau)
    }
    val got = ActiveUsers.q227.build(spark, sf0001).collect()
      .map(r => (Math.floorDiv(r.getTimestamp(0).getTime, 86400000L),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect.toSeq)
  }
}
