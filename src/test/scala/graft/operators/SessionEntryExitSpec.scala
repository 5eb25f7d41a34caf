package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SessionEntryExit]] (X195) oracles: entry/exit follow the
  * session's time order (not collection order), a one-event session
  * is a bounce with entry = exit, the 30-minute cut splits the
  * matrix, and sf0.001 ≡ a driver replay.
  */
class SessionEntryExitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  private def run(events: Seq[(Long, Long, String)])
      : Map[(String, String), (Long, Long, Long, Double)] = {
    val df = events.zipWithIndex
      .map { case ((u, m, ty), i) => (i.toLong, ts(m), u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("entryexit")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    SessionEntryExit.q231.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    }.toMap
  }

  test("A,B,C in one session: entry A exit C; a lone D is a bounce " +
      "with entry = exit; the cut splits") {
    val out = run(Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"),
      (2L, 0L, "D"),
      (3L, 0L, "A"), (3L, 60L, "C"))) // split into two 1-event sessions
    assert(out(("A", "C")) === ((1L, 0L, 3L, 3.0)))
    assert(out(("D", "D")) === ((1L, 1L, 1L, 1.0)))
    assert(out(("A", "A")) === ((1L, 1L, 1L, 1.0)))
    assert(out(("C", "C")) === ((1L, 1L, 1L, 1.0)))
  }

  test("q231 at sf0.001 ≡ driver replay of the boundary matrix") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val perSession = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._2.getTime, e._3))
      var sid = 0L
      var last: Option[Long] = None
      ordered.map { e =>
        if (last.exists(l => (e._2.getTime - l) / 1000.0 > 1800) ||
          last.isEmpty) sid += 1
        last = Some(e._2.getTime)
        ((u, sid), e._4)
      }
    }.groupBy(_._1).toSeq.map { case (_, es) =>
      (es.head._2, es.last._2, es.size.toLong)
    }
    val expect = perSession.groupBy(p => (p._1, p._2)).map {
      case (k, v) =>
        k -> ((v.size.toLong, v.count(_._3 == 1L).toLong,
          v.map(_._3).sum))
    }
    val got = SessionEntryExit.q231.build(spark, sf0001).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, b, te) = expect(k)
      assert(r.getLong(2) === n && r.getLong(3) === b &&
        r.getLong(4) === te, k)
      assert(r.getDouble(5) === te.toDouble / n.toDouble, k)
    }
  }
}
