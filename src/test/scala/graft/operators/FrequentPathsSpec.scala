package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[FrequentPaths]] (X175) oracles: the path preserves the session's
  * (ts, event_id) total order (not collection order), truncation cuts
  * at exactly PrefixLen steps, the session cut separates paths, and
  * prefix-distinct journeys that pair-support (X170) cannot tell
  * apart are distinct rows here.
  */
class FrequentPathsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp =
    new Timestamp(1700000000000L + min * 60000L)

  private def run(events: Seq[(Long, Long, String)])
      : Seq[(Int, String, Long, Long)] = {
    val df = events.zipWithIndex
      .map { case ((u, m, ty), i) => (u, ts(m), i.toLong, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    FrequentPaths.paths(df).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
  }

  test("path order is the session's time order; same-minute ties " +
      "break by event_id (insertion index here)") {
    val out = run(Seq((1L, 0L, "A"), (1L, 1L, "C"), (1L, 1L, "B")))
    assert(out === Seq((1, "A>C>B", 1L, 1L)))
  }

  test("truncation: a 9-step session contributes only its first-6 " +
      "prefix") {
    val types = Seq("A", "B", "C", "D", "E", "F", "G", "H", "I")
    val out = run(types.zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, t)
    })
    assert(out === Seq((1, "A>B>C>D>E>F", 1L, 1L)))
  }

  test("session cut splits paths; identical prefixes from different " +
      "users aggregate with n_users counting distinct") {
    val out = run(Seq(
      (1L, 0L, "A"), (1L, 1L, "B"), // user1 session1: A>B
      (1L, 60L, "A"), (1L, 61L, "B"), // user1 session2: A>B
      (2L, 0L, "A"), (2L, 1L, "B"), // user2: A>B
      (3L, 0L, "B"), (3L, 1L, "A"))) // user3: B>A — distinct row
    assert(out === Seq(
      (1, "A>B", 3L, 2L),
      (2, "B>A", 1L, 1L)))
  }

  test("q213 at sf0.001 ≡ driver replay of the path census") {
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
    }.groupBy(_._1).toSeq.map { case ((u, _), es) =>
      (u, es.map(_._2).take(FrequentPaths.PrefixLen).mkString(">"))
    }
    val census = perSession.groupBy(_._2).map { case (p, ss) =>
      p -> ((ss.size.toLong, ss.map(_._1).distinct.size.toLong))
    }
    val expect = census.toSeq
      .sortBy { case (p, (n, _)) => (-n, p) }
      .take(FrequentPaths.TopPaths)
    val got = FrequentPaths.q213.build(spark, sf0001).collect()
      .map(r => (r.getString(1), (r.getLong(2), r.getLong(3)))).toSeq
    assert(got === expect)
  }
}
