package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[OhlcBars]] (X149) oracles: hand-computed bars on a planted day
  * INCLUDING a timestamp tie broken by event_id (the total-order
  * contract), multi-day separation, and an exact decimal amount.
  */
class OhlcBarsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("planted bars: open/close under (ts, event_id) order — tie at " +
      "the open broken by event_id — high/low/volume/amount exact") {
    val dir = tmpDir("ohlc")
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      // day 1: ties at 09:00 — open must be event_id 1, not 2
      (1L, ts("2024-03-01 09:00:00"), 1L, "trade", 10.50, "{}"),
      (2L, ts("2024-03-01 09:00:00"), 1L, "trade", 99.99, "{}"),
      (3L, ts("2024-03-01 12:00:00"), 1L, "trade", 1.25, "{}"),
      (4L, ts("2024-03-01 15:00:00"), 1L, "trade", 20.75, "{}"),
      // day 2: single event — open = close = high = low
      (5L, ts("2024-03-02 10:00:00"), 1L, "trade", 7.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = OhlcBars.q190.build(spark, dir).collect().map(r =>
      r.getAs[String]("day") ->
        ((r.getAs[Double]("open"), r.getAs[Double]("close"),
          r.getAs[Double]("high"), r.getAs[Double]("low"),
          r.getAs[Long]("volume"), r.getAs[Double]("amount")))).toMap
    assert(out("2024-03-01") ===
      ((10.50, 20.75, 99.99, 1.25, 4L, 132.49)))
    assert(out("2024-03-02") === ((7.00, 7.00, 7.00, 7.00, 1L, 7.00)))
  }

  test("q190 at sf0.001: bars partition the stream exactly (Σ volume " +
      "= |events|), low <= open/close <= high") {
    val rows = OhlcBars.q190.build(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(rows.map(_.getAs[Long]("volume")).sum === n)
    rows.foreach { r =>
      val (o, c, h, l) = (r.getAs[Double]("open"),
        r.getAs[Double]("close"), r.getAs[Double]("high"),
        r.getAs[Double]("low"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }
}
