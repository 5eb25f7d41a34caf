package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("backward as-of: latest right at-or-before, per key, ties deterministic") {
    val quotes = Seq(
      ("A", ts(1), 100L, 1.0),
      ("A", ts(3), 101L, 2.0),
      ("A", ts(3), 102L, 3.0), // same key+time: greatest quote_id wins
      ("B", ts(2), 200L, 9.0),
      (null.asInstanceOf[String], ts(1), 300L, 5.0)) // null key: never matches
      .toDF("sym", "ts", "quote_id", "px")
    val trades = Seq(
      ("A", ts(0), 1L),  // before any quote → null
      ("A", ts(3), 2L),  // equal time → at-or-before inclusive, id 102
      ("A", ts(9), 3L),  // after all → id 102
      ("B", ts(5), 4L),
      ("C", ts(5), 5L),  // key with no quotes → null
      (null.asInstanceOf[String], ts(5), 6L)) // null key → null (equi-join)
      .toDF("sym", "ts", "trade_id")

    val out = AsOfJoin.backward(trades, quotes, "sym", "ts", "ts",
        rightVals = Seq("quote_id", "px"),
        rightTieBreak = Seq("quote_id"))
      .select("trade_id", "asof_quote_id", "asof_px")
      .as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)

    assert(out === Array(
      (1L, None, None),
      (2L, Some(102L), Some(3.0)),
      (3L, Some(102L), Some(3.0)),
      (4L, Some(200L), Some(9.0)),
      (5L, None, None),
      (6L, None, None)))
  }

  test("property: as-of join equals brute-force max-right-at-or-before") {
    import org.scalacheck.Gen
    val rnd = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 50))).sample.get
    val rights = rnd.zipWithIndex.map { case ((k, m), i) =>
      (s"k$k", ts(m), i.toLong)
    }
    val lefts = rnd.take(150).zipWithIndex.map { case ((k, m), i) =>
      (s"k${(k + 3) % 11}", ts(m), (1000 + i).toLong)
    }
    val rightDf = rights.toDF("k", "ts", "rid")
    val leftDf = lefts.toDF("k", "ts", "lid")

    val got = AsOfJoin.backward(leftDf, rightDf, "k", "ts", "ts",
        rightVals = Seq("rid"), rightTieBreak = Seq("rid"))
      .select("lid", "asof_rid")
      .as[(Long, Option[Long])].collect().toMap

    // brute force: for each left row, the max-rid among max-ts rights
    // with ts <= left.ts and same key
    val expected = lefts.map { case (k, t, lid) =>
      val cands = rights.filter(r => r._1 == k && !r._2.after(t))
      val best = if (cands.isEmpty) None
      else {
        val maxTs = cands.map(_._2.getTime).max
        Some(cands.filter(_._2.getTime == maxTs).map(_._3).max)
      }
      lid -> best
    }.toMap
    assert(got === expected)
  }
}
