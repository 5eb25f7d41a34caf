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
      ("B", ts(2), 200L, 9.0))
      .toDF("sym", "ts", "quote_id", "px")
    val trades = Seq(
      ("A", ts(0), 1L),  // before any quote → null
      ("A", ts(3), 2L),  // equal time → at-or-before inclusive, id 102
      ("A", ts(9), 3L),  // after all → id 102
      ("B", ts(5), 4L),
      ("C", ts(5), 5L))  // key with no quotes → null
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
      (5L, None, None)))
  }
}
