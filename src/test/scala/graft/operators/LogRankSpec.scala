package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[LogRank]] (X249) oracles: a brute-force O/E/V replay on planted
  * conversion histories, identical arms scoring χ² = 0 exactly, the
  * censoring convention (non-converters at risk until last activity),
  * and separated curves crossing the χ²(0.95,1) bar.
  */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  /** (user, hour, eventType) rows → (n_users, n_deaths, o1, e1_r,
    * chi2_r, curves_differ), all None when the fold frame is empty.
    */
  private def run(obs: Seq[(Long, Int, String)])
      : (Option[Long], Option[Long], Option[Long], Option[Double],
        Option[Double], Option[Boolean]) = {
    val dir = tmpDir("logrank")
    obs.zipWithIndex.map { case ((u, h, et), i) =>
      (i.toLong, new Timestamp((800000L + h) * 3600000L), u, et,
        1.0d, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = LogRank.q273.build(spark, dir).collect()(0)
    def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (l(0), l(1), l(2), d(3), d(4),
      if (r.isNullAt(5)) None else Some(r.getBoolean(5)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force log-rank: per-user (time, event) spans, risk sets by
    * suffix counts, per-time hypergeometric E/V, one χ².
    */
  private def replay(obs: Seq[(Long, Int, String)])
      : (Long, Double, Option[Double]) = {
    val spans = obs.groupBy(_._1).map { case (u, rows) =>
      val hs = rows.map(_._2)
      val conv = rows.filter(_._3 == "purchase").map(_._2)
      val (event, time) =
        if (conv.nonEmpty) (1, conv.min - hs.min)
        else (0, hs.max - hs.min)
      (u % 2, time.toLong, event)
    }.toSeq
    val tot = Array(spans.count(_._1 == 0).toLong,
      spans.count(_._1 == 1).toLong)
    var o1 = 0L
    var ee1 = BigDecimal(0)
    var vv = BigDecimal(0)
    for (v <- spans.map(_._2).distinct.sorted) {
      val d0 = spans.count(s => s._1 == 0 && s._2 == v && s._3 == 1)
      val d1 = spans.count(s => s._1 == 1 && s._2 == v && s._3 == 1)
      if (d0 + d1 > 0) {
        val r0 = tot(0) - spans.count(s => s._1 == 0 && s._2 < v)
        val r1 = tot(1) - spans.count(s => s._1 == 1 && s._2 < v)
        val nt = (r0 + r1).toDouble
        val dt = (d0 + d1).toDouble
        o1 += d1
        ee1 += BigDecimal(dt * r1 / nt).setScale(14,
          BigDecimal.RoundingMode.HALF_UP)
        val vt = if (r0 + r1 > 1)
          dt * (r1 / nt) * (r0 / nt) * (nt - dt) / (nt - 1.0)
        else 0.0
        vv += BigDecimal(vt).setScale(14,
          BigDecimal.RoundingMode.HALF_UP)
      }
    }
    val chi = if (vv.toDouble > 0)
      Some(round6((o1 - ee1.toDouble) * (o1 - ee1.toDouble) /
        vv.toDouble))
    else None
    (o1, ee1.toDouble, chi)
  }

  test("χ² matches the replay on a mixed censored fixture") {
    // even arm converts fast; odd arm converts slow or never
    val obs = Seq[(Long, Int, String)](
      (0L, 0, "view"), (0L, 2, "purchase"),
      (2L, 0, "view"), (2L, 3, "purchase"), (2L, 9, "view"),
      (4L, 0, "view"), (4L, 8, "view"), // censored at 8
      (1L, 0, "view"), (1L, 7, "purchase"),
      (3L, 0, "view"), (3L, 9, "view"), // censored at 9
      (5L, 0, "view"), (5L, 5, "view"), (5L, 6, "purchase"))
    val (nUsers, nDeaths, o1, e1, chi2, _) = run(obs)
    val (ro1, re1, rchi) = replay(obs)
    assert(nUsers === Some(6L) && nDeaths === Some(4L))
    assert(o1 === Some(ro1))
    assert(e1 === Some(round6(re1)))
    assert(chi2 === rchi)
  }

  test("identical arms: observed equals expected, χ² = 0") {
    // mirror users: each even user has an odd twin with the same story
    val story = Seq((0, "view"), (4, "purchase"))
    val censored = Seq((0, "view"), (6, "view"))
    val obs = (0L to 3L).flatMap { u =>
      (if (u < 2) story else censored).map { case (h, et) => (u, h, et) }
    }
    val (_, _, o1, e1, chi2, sig) = run(obs)
    assert(o1.map(_.toDouble) === e1)
    assert(chi2 === Some(0.0))
    assert(sig === Some(false))
  }

  test("separated conversion curves cross the 3.84 bar") {
    // 20 even users convert at hour 1; 20 odd users never convert
    val obs = (0 until 20).flatMap { i =>
      Seq((i.toLong * 2, 0, "view"), (i.toLong * 2, 1, "purchase"))
    } ++ (0 until 20).flatMap { i =>
      Seq((i.toLong * 2 + 1, 0, "view"), (i.toLong * 2 + 1, 10, "view"))
    }
    val (nUsers, nDeaths, _, _, chi2, sig) = run(obs)
    val (_, _, rchi) = replay(obs)
    assert(nUsers === Some(40L) && nDeaths === Some(20L))
    assert(chi2 === rchi)
    assert(sig === Some(true))
  }

  test("no deaths at all: the death-time frame is empty, NULL fold") {
    val obs = Seq[(Long, Int, String)](
      (0L, 0, "view"), (0L, 3, "view"),
      (1L, 0, "view"), (1L, 5, "view"))
    val (_, _, _, _, chi2, sig) = run(obs)
    assert(chi2 === None && sig === None)
  }
}
