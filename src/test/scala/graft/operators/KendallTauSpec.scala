package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[KendallTau]] (X213) oracles: hand-checkable τ-b on planted
  * concordant / reversed / tied daily series.
  */
class KendallTauSpec extends SparkSpec {
  import spark.implicits._

  /** Plant events so type `ty` has daily count `c` on epoch day
    * 19700 + day, then run q246.
    */
  private def run(series: Seq[(String, Int, Int)])
      : Map[(String, String), (Long, Long, Long, Long, Long,
        Option[Double])] = {
    val dir = tmpDir("kt")
    series.flatMap { case (ty, day, c) =>
      (0 until c).map { i =>
        ((day * 100000 + i).toLong,
          new Timestamp((19700L + day) * 86400000L + i * 1000L),
          i.toLong, ty, 1.0d, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    KendallTau.q246.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6),
          if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    }.toMap
  }

  test("perfectly concordant series: tau = 1; reversed: tau = -1") {
    val a = Seq(1, 2, 3, 4).zipWithIndex.map { case (c, d) =>
      ("aa", d, c)
    }
    val up = Seq(2, 4, 6, 8).zipWithIndex.map { case (c, d) =>
      ("bb", d, c)
    }
    val down = Seq(9, 7, 5, 3).zipWithIndex.map { case (c, d) =>
      ("cc", d, c)
    }
    val out = run(a ++ up ++ down)
    val (n0, conc, disc, tx, ty, tau) = out(("aa", "bb"))
    assert((n0, conc, disc, tx, ty) === ((6L, 6L, 0L, 0L, 0L)))
    assert(tau === Some(1.0))
    assert(out(("aa", "cc"))._6 === Some(-1.0))
    // bb vs cc is also strictly discordant
    assert(out(("bb", "cc"))._6 === Some(-1.0))
  }

  test("one series constant: all its pairs tied, tau NULL") {
    val out = run(Seq(("aa", 0, 1), ("aa", 1, 2), ("aa", 2, 3),
      ("bb", 0, 5), ("bb", 1, 5), ("bb", 2, 5)))
    val (n0, _, _, _, tiesY, tau) = out(("aa", "bb"))
    assert(n0 === 3L && tiesY === 3L)
    assert(tau === None)
  }

  test("hand case with partial ties matches the tau-b formula") {
    // aa: 1 2 2 3, bb: 1 1 2 3 over 4 days -> 6 day pairs
    val out = run(
      Seq(1, 2, 2, 3).zipWithIndex.map { case (c, d) => ("aa", d, c) } ++
        Seq(1, 1, 2, 3).zipWithIndex.map { case (c, d) => ("bb", d, c) })
    val (n0, conc, disc, tx, ty, tau) = out(("aa", "bb"))
    assert(n0 === 6L)
    // pairs (d0,d1):(+,0)tieY (d0,d2):(+,+)C (d0,d3):(+,+)C
    // (d1,d2):(0,+)tieX (d1,d3):(+,+)C (d2,d3):(+,+)C
    assert((conc, disc, tx, ty) === ((4L, 0L, 1L, 1L)))
    val expect = BigDecimal(4.0 / math.sqrt((6.0 - 1.0) * (6.0 - 1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(tau === Some(expect))
  }
}
