package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[SeasonalIndex]] (X232) oracles: flat series → all indices exactly
  * 1, a planted weekly spike recovered at the right dow, edge days
  * without a full ±3 window excluded, and a driver replay of the
  * ratio-to-MA fold on an irregular series.
  */
class SeasonalIndexSpec extends SparkSpec {
  import spark.implicits._

  // series = (type, day, count); day is an absolute epoch day
  private def run(series: Seq[(String, Int, Int)])
      : Map[(String, Long), (Long, Double)] = {
    val dir = tmpDir("si")
    series.flatMap { case (ty, day, c) =>
      (0 until c).map { i =>
        ((day * 100000 + i).toLong,
          new Timestamp(day * 86400000L + i * 1000L),
          i.toLong, ty, 1.0d, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SeasonalIndex.q264.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver replay over one type's (day → count) series. */
  private def replay(counts: Map[Int, Int]): Map[Long, Double] = {
    val ratios = counts.keys.toSeq.sorted.flatMap { d =>
      val win = (d - 3 to d + 3).flatMap(counts.get)
      if (win.size == 7)
        Some((d % 7).toLong ->
          7.0 * counts(d) / win.map(_.toLong).sum)
      else None
    }
    ratios.groupBy(_._1).view.mapValues { rs =>
      round6(rs.map(r => BigDecimal(r._2)
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        rs.size)
    }.toMap
  }

  test("flat series: every index is exactly 1; edges excluded") {
    val out = run((0 until 21).map(d => ("aa", 19700 + d, 6)))
    // days 19703..19717 have full windows: 15 days = 2 full weeks + 1
    assert(out.values.map(_._1).sum === 15L)
    out.foreach { case (_, (_, idx)) => assert(idx === 1.0) }
  }

  test("weekly spike: the spiked dow reads > 1, the rest < 1") {
    // spike every day ≡ 0 (mod 7): count 20 vs base 6
    val out = run((0 until 21).map { d =>
      val day = 19700 + d
      ("aa", day, if (day % 7 == 0) 20 else 6)
    })
    val spiked = out((("aa", 0L)))._2
    assert(spiked > 1.5, s"spiked dow index $spiked")
    (1L to 6L).foreach { dw =>
      out.get(("aa", dw)).foreach { case (_, idx) => assert(idx < 1.0) }
    }
  }

  test("irregular series matches the driver ratio-to-MA replay") {
    val counts = Seq(5, 9, 2, 14, 7, 3, 11, 6, 13, 4, 8, 10, 2, 9)
      .zipWithIndex.map { case (c, i) => (19700 + i) -> c }.toMap
    val out = run(counts.toSeq.map { case (d, c) => ("aa", d, c) })
    val expect = replay(counts)
    assert(out.keySet.map(_._2) === expect.keySet)
    expect.foreach { case (dw, idx) =>
      assert(out(("aa", dw))._2 === idx, s"dow $dw")
    }
  }

  test("a one-day gap breaks the ±3 windows that straddle it") {
    val counts = ((0 until 7) ++ (8 until 15))
      .map(d => (19700 + d) -> 6).toMap
    val out = run(counts.toSeq.map { case (d, c) => ("aa", d, c) })
    // only 19703 (first block) and 19711 (second block) keep a full
    // ±3 calendar window around the missing day 19707
    assert(out.values.map(_._1).sum === 2L)
    val expect = replay(counts)
    assert(out.keySet.map(_._2) === expect.keySet)
    expect.foreach { case (dw, idx) =>
      assert(out(("aa", dw))._2 === idx, s"dow $dw")
    }
  }
}
