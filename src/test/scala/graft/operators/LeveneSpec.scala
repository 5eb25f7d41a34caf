package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[Levene]] (X239) oracles: the textbook F on absolute deviations
  * for a planted two-group table, equal spreads staying under the
  * asymptotic bar, unequal spreads crossing it, and the location-shift
  * invariance that separates Levene from ANOVA.
  */
class LeveneSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : (Long, Long, Option[Double], Double, Option[Boolean]) = {
    val dir = tmpDir("levene")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Levene.q270.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getDouble(3),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One-way ANOVA F on z_ij = |y_ij − ȳ_j|. */
  private def replay(rows: Seq[(String, Double)]): Option[Double] = {
    val groups = rows.groupBy(_._1).values.toSeq
    val k = groups.size
    val n = rows.size
    val zs = groups.map { g =>
      val mean = g.map(_._2).sum / g.size
      g.map(r => math.abs(r._2 - mean))
    }
    val zbar = zs.flatten.sum / n
    val ssb = zs.map(g => g.size * math.pow(g.sum / g.size - zbar, 2))
      .sum
    val ssw = zs.map(g => {
      val m = g.sum / g.size; g.map(z => math.pow(z - m, 2)).sum
    }).sum
    if (k > 1 && n > k && ssw > 0)
      Some(round6((ssb / (k - 1)) / (ssw / (n - k))))
    else None
  }

  test("two groups, unequal spread: F matches the replay and flags") {
    // g1 tight around 100, g2 wild around 100: same centers
    val rows = Seq("g1" -> 99.0, "g1" -> 100.0, "g1" -> 101.0,
      "g1" -> 100.0, "g1" -> 99.0, "g1" -> 101.0,
      "g2" -> 50.0, "g2" -> 150.0, "g2" -> 60.0,
      "g2" -> 140.0, "g2" -> 55.0, "g2" -> 145.0)
    val (n, k, f, crit, het) = run(rows)
    assert(n === 12L && k === 2L)
    assert(f === replay(rows))
    // df1 = 1: crit = chi2(0.95,1)/1 = 3.841459
    assert(crit === 3.841459)
    assert(het === Some(true))
  }

  test("equal spreads at different centers: no heteroscedasticity") {
    // the location shift ANOVA would flag is invisible to Levene
    val rows = Seq("g1" -> 10.0, "g1" -> 12.0, "g1" -> 14.0,
      "g1" -> 16.0,
      "g2" -> 1010.0, "g2" -> 1012.0, "g2" -> 1014.0, "g2" -> 1016.0)
    val (_, _, f, _, het) = run(rows)
    assert(f === replay(rows))
    assert(het === Some(false))
  }

  test("zero within-group spread everywhere: NULL F") {
    val rows = Seq("g1" -> 5.0, "g1" -> 5.0, "g2" -> 9.0, "g2" -> 9.0)
    val (_, _, f, _, het) = run(rows)
    assert(f === None && het === None)
  }
}
