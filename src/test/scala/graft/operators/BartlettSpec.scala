package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[Bartlett]] (X252) oracles: the T/C replay on planted groups,
  * equal variances staying under the bar, unequal variances crossing
  * it, the n < 2 exclusion, and the zero-variance NULL.
  */
class BartlettSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : (Long, Long, Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("bartlett")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Bartlett.q283.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** T = [(N−k)ln S²_p − Σ(nⱼ−1)ln S²ⱼ]/C on groups with n ≥ 2. */
  private def replay(rows: Seq[(String, Double)]): Option[Double] = {
    val gs = rows.groupBy(_._1).values.map(_.map(_._2))
      .filter(_.size >= 2).toSeq
    val k = gs.size
    val n = gs.map(_.size).sum
    val s2s = gs.map { g =>
      val m = g.size
      (m, (m * g.map(v => v * v).sum - math.pow(g.sum, 2)) /
        (m * (m - 1.0)))
    }
    if (k < 2 || s2s.exists(_._2 <= 0)) None
    else {
      val df2 = (n - k).toDouble
      val sp2 = s2s.map { case (m, s2) => (m - 1) * s2 }.sum / df2
      val num = df2 * math.log(sp2) -
        s2s.map { case (m, s2) => (m - 1) * math.log(s2) }.sum
      val c = 1.0 + (s2s.map(p => 1.0 / (p._1 - 1)).sum - 1.0 / df2) /
        (3.0 * (k - 1))
      Some(round6(num / c))
    }
  }

  test("equal spreads: T near 0, under the bar") {
    val rows = Seq("g1" -> 10.0, "g1" -> 12.0, "g1" -> 14.0,
      "g2" -> 20.0, "g2" -> 22.0, "g2" -> 24.0)
    val (n, k, t, crit, het) = run(rows)
    assert(n === 6L && k === 2L)
    assert(t === Some(0.0)) // identical spreads, identical variances
    assert(crit === Some(3.841459))
    assert(het === Some(false))
  }

  test("unequal spreads: T matches the replay and flags") {
    val rows = Seq("g1" -> 100.0, "g1" -> 100.5, "g1" -> 99.5,
      "g1" -> 100.25, "g1" -> 99.75,
      "g2" -> 50.0, "g2" -> 150.0, "g2" -> 60.0,
      "g2" -> 140.0, "g2" -> 100.0)
    val (_, _, t, _, het) = run(rows)
    assert(t.isDefined)
    assert(het === Some(true))
  }

  test("three groups: T matches the replay") {
    val rows = Seq("g1" -> 1.0, "g1" -> 3.0, "g1" -> 5.0,
      "g2" -> 10.0, "g2" -> 14.0, "g2" -> 18.0, "g2" -> 22.0,
      "g3" -> 7.0, "g3" -> 8.0)
    val (n, k, t, crit, _) = run(rows)
    assert(n === 9L && k === 3L)
    assert(t === replay(rows))
    assert(crit === Some(5.991465))
  }

  test("singleton groups are excluded from the fold") {
    val rows = Seq("lone" -> 42.0,
      "g1" -> 1.0, "g1" -> 2.0, "g2" -> 5.0, "g2" -> 7.0)
    val (n, k, _, _, _) = run(rows)
    assert(n === 4L && k === 2L)
  }

  test("zero variance in one group: NULL T") {
    val rows = Seq("g1" -> 5.0, "g1" -> 5.0, "g2" -> 1.0, "g2" -> 9.0)
    val (_, _, t, _, het) = run(rows)
    assert(t === None && het === None)
  }
}
