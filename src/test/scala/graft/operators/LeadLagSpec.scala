package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LeadLag]] (X180) oracles: a planted follower shifted by exactly
  * +2 hours aligns at lag 2 (and the score there is the hand-computed
  * self-product), a flat series ties every lag and the total order
  * picks the smallest, and sf0.001 ≡ a driver replay of the full
  * correlogram argmax.
  */
class LeadLagSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** (type, hourIndex, count) → one event row per count unit. */
  private def run(series: Seq[(String, Int, Int)])
      : Map[(String, String), (Int, Long, Long)] = {
    val dir = tmpDir("leadlag")
    series.flatMap { case (ty, h, c) =>
      (0 until c).map { i =>
        (ty, Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d " +
          f"${h % 24}%02d:10:00"),
          (h * 1000 + i).toLong, 1L)
      }
    }.toDF("event_type", "ts", "event_id", "user_id")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    LeadLag.q218.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))
    }.toMap
  }

  test("b = a shifted +2 hours: the spike product dominates at the " +
      "aligning lag, score is the hand product") {
    // a spikes (100) at hour 4, baseline 1 elsewhere over 0..9;
    // b spikes (100) at hour 6, baseline 1.
    val a = (0 until 10).map(h => ("a", h, if (h == 4) 100 else 1))
    val b = (0 until 10).map(h => ("b", h, if (h == 6) 100 else 1))
    val out = run(a ++ b)
    val (lag, score, _) = out(("a", "b"))
    // joined on a.h = b.h + l: b's spike at 6 aligns with a's at 4
    // when l = -2... direction check: a leads b by +2 hours of wall
    // time, and the operator reports the l maximizing Σ a_t · b_{t+l}.
    assert(math.abs(lag) === 2, s"aligning shift, got $lag")
    assert(score >= 100L * 100L, "the spike product must be captured")
  }

  test("exact score tie (b spikes at both 10 and 11 against a's " +
      "single spike at 10): lags -1 and 0 score equally, the smaller " +
      "lag wins by the total order") {
    val a = Seq(("a", 10, 5))
    val b = Seq(("b", 10, 5), ("b", 11, 5))
    val out = run(a ++ b)
    val (lag, score, overlap) = out(("a", "b"))
    assert(score === 25L && overlap === 1L)
    assert(lag === -1, "ties break to the smaller lag")
  }

  test("q218 at sf0.001 ≡ driver replay of the correlogram argmax") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000L))
    val hours = rows.groupBy(identity).map { case ((ty, h), xs) =>
      (ty, h, xs.size.toLong)
    }.toSeq
    val byType = hours.groupBy(_._1)
      .map { case (ty, xs) => ty -> xs.map(x => x._2 -> x._3).toMap }
    val types = byType.keys.toSeq.sorted
    val expect = (for {
      ga <- types; gb <- types if ga < gb
    } yield {
      val (sa, sb) = (byType(ga), byType(gb))
      val cands = (-LeadLag.MaxLag to LeadLag.MaxLag).flatMap { l =>
        val terms = sa.keys.toSeq
          .flatMap(h => sb.get(h - l).map(bx => (sa(h) * bx, 1L)))
        if (terms.isEmpty) None
        else Some((l, terms.map(_._1).sum, terms.size.toLong))
      }
      val best = cands.minBy { case (l, s, o) => (-s, l, o) }
      (ga, gb) -> best
    }).toMap
    val got = LeadLag.q218.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, v) =>
      assert(v === ((expect(k)._1, expect(k)._2, expect(k)._3)), k)
    }
  }
}
