package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PositionAttribution]] (X185) oracles: the U-shape on planted
  * journeys (40/20/40, the 1- and 2-touch conventions, the
  * earliest-middle remainder rule), the exactly-one-million-per-
  * purchase invariant, out-of-window touches → organic, and sf0.001
  * ≡ a driver replay of the census.
  */
class PositionAttributionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Hour = 3600000000L

  /** (user, usHours, type) rows → channel → (n, credit). */
  private def run(events: Seq[(Long, Long, String)])
      : Map[String, (Long, Long)] = {
    val df = events.zipWithIndex.map { case ((u, h, ty), i) =>
      (i.toLong, u, ty, h * Hour)
    }.toDF("event_id", "user_id", "event_type", "us")
    PositionAttribution.uShaped(df).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))
    }.toMap
  }

  test("3-touch journey view,click,view: U gives view 800k, click " +
      "200k") {
    val out = run(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "view"),
      (1L, 3L, "purchase")))
    assert(out("view") === ((1L, 800000L)))
    assert(out("click") === ((1L, 200000L)))
  }

  test("1-touch takes all; 2-touch splits 500k/500k; no touches → " +
      "organic 1M; out-of-window-only touches → organic") {
    val out = run(Seq(
      (1L, 0L, "view"), (1L, 1L, "purchase"), // 1 touch
      (2L, 0L, "view"), (2L, 1L, "click"), (2L, 2L, "purchase"),
      (3L, 5L, "purchase"), // no touches at all
      (4L, 0L, "click"), (4L, 300L, "purchase"))) // 300h > 7d window
    assert(out("view") === ((2L, 1500000L)))
    assert(out("click") === ((1L, 500000L)))
    assert(out("organic") === ((2L, 2000000L)))
  }

  test("5-touch remainder rule: middles get 66667,66667,66666 — the " +
      "earliest middles carry the remainder; per-purchase credit " +
      "sums to exactly 1M") {
    // touches: view(first) click click click view(last)
    val out = run(Seq(
      (1L, 0L, "view"), (1L, 1L, "click"), (1L, 2L, "click"),
      (1L, 3L, "click"), (1L, 4L, "view"), (1L, 5L, "purchase")))
    assert(out("view") === ((1L, 800000L)))
    assert(out("click") === ((1L, 200000L)))
    assert(out.values.map(_._2).sum === 1000000L)
    // distinguish the remainder ORDER: middles click(rk2) view(rk3)
    // click(rk4): 200000 div 3 = 66666 rem 2 → rk2,rk3 get +1
    val out2 = run(Seq(
      (9L, 0L, "view"), (9L, 1L, "click"), (9L, 2L, "view"),
      (9L, 3L, "click"), (9L, 4L, "view"), (9L, 5L, "purchase")))
    // view: first 400000 + last 400000 + middle rk3 66667 = 866667
    assert(out2("view")._2 === 866667L)
    assert(out2("click")._2 === 66667L + 66666L)
  }

  test("q222 at sf0.001 ≡ driver replay of the census") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L))
    val touches = rows.filter(r => r._3 == "view" || r._3 == "click")
    val purchases = rows.filter(_._3 == "purchase")
    val credit = scala.collection.mutable.Map[String, Long]()
    val nPur = scala.collection.mutable.Map[String,
      scala.collection.mutable.Set[Long]]()
    purchases.foreach { case (pid, u, _, pus) =>
      val win = touches.filter(t => t._2 == u && t._4 < pus &&
        pus - t._4 <= 7L * 86400000000L)
        .sortBy(t => (t._4, t._1))
      val m = win.length
      def add(ch: String, c: Long): Unit = {
        credit(ch) = credit.getOrElse(ch, 0L) + c
        nPur.getOrElseUpdate(ch,
          scala.collection.mutable.Set[Long]()) += pid
      }
      if (m == 0) add("organic", 1000000L)
      else if (m == 1) add(win(0)._3, 1000000L)
      else if (m == 2) { add(win(0)._3, 500000L); add(win(1)._3, 500000L) }
      else {
        add(win(0)._3, 400000L); add(win(m - 1)._3, 400000L)
        val r = 200000L % (m - 2)
        win.slice(1, m - 1).zipWithIndex.foreach { case (t, i) =>
          add(t._3, 200000L / (m - 2) + (if (i < r) 1L else 0L))
        }
      }
    }
    val got = PositionAttribution.q222.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === credit.keySet.toSet)
    credit.foreach { case (ch, c) =>
      assert(got(ch)._2 === c, s"credit $ch")
      assert(got(ch)._1 === nPur(ch).size.toLong, s"n $ch")
    }
    assert(credit.values.sum === purchases.length.toLong * 1000000L,
      "total credit conserves")
  }
}
