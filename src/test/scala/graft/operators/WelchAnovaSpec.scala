package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[WelchAnova]] (X260) oracles: the weighted-F replay on planted
  * groups, equal means scoring F* = 0 exactly, the heteroscedastic
  * shift classical ANOVA would mis-model, the singleton exclusion,
  * and the zero-variance NULL.
  */
class WelchAnovaSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : (Long, Long, Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("welch")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = WelchAnova.q291.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def replay(rows: Seq[(String, Double)]): Option[Double] = {
    val gs = rows.groupBy(_._1).values.map(_.map(_._2))
      .filter(_.size >= 2).toSeq
    val k = gs.size
    val stats = gs.map { g =>
      val n = g.size
      val s2 = (n * g.map(v => v * v).sum - math.pow(g.sum, 2)) /
        (n * (n - 1.0))
      (n, g.sum / n, s2)
    }
    if (k < 2 || stats.exists(_._3 <= 0)) return None
    val ws = stats.map { case (n, _, s2) => n / s2 }
    val sw = ws.sum
    val xw = stats.zip(ws).map { case ((_, m, _), w) => w * m }.sum / sw
    val num = stats.zip(ws).map { case ((_, m, _), w) =>
      w * (m - xw) * (m - xw) }.sum / (k - 1)
    val lam = stats.zip(ws).map { case ((n, _, _), w) =>
      (1 - w / sw) * (1 - w / sw) / (n - 1) }.sum
    Some(round6(num / (1 + 2.0 * (k - 2) / (k * k - 1.0) * lam)))
  }

  test("heteroscedastic shifted groups: F* matches the replay, flags") {
    val rows = Seq("g1" -> 10.0, "g1" -> 10.5, "g1" -> 9.5,
      "g1" -> 10.25, "g1" -> 9.75,
      "g2" -> 100.0, "g2" -> 140.0, "g2" -> 60.0,
      "g2" -> 120.0, "g2" -> 80.0)
    val (n, k, f, crit, sig) = run(rows)
    assert(n === 10L && k === 2L)
    assert(f === replay(rows))
    assert(crit === Some(3.841459))
    assert(sig === Some(true))
  }

  test("equal group means: F* = 0 exactly") {
    val rows = Seq("g1" -> 9.0, "g1" -> 11.0,
      "g2" -> 5.0, "g2" -> 15.0, "g3" -> 0.0, "g3" -> 20.0)
    val (_, k, f, crit, sig) = run(rows)
    assert(k === 3L)
    assert(f === Some(0.0))
    assert(crit === Some(round6(5.991464547107979 / 2)))
    assert(sig === Some(false))
  }

  test("three unequal groups: F* matches the replay") {
    val rows = Seq("g1" -> 1.0, "g1" -> 3.0, "g1" -> 5.0,
      "g2" -> 10.0, "g2" -> 14.0, "g2" -> 18.0, "g2" -> 22.0,
      "g3" -> 7.0, "g3" -> 8.0)
    val (_, _, f, _, _) = run(rows)
    assert(f === replay(rows))
  }

  test("singleton groups are excluded") {
    val rows = Seq("lone" -> 42.0,
      "g1" -> 1.0, "g1" -> 2.0, "g2" -> 5.0, "g2" -> 7.0)
    val (n, k, _, _, _) = run(rows)
    assert(n === 4L && k === 2L)
  }

  test("zero variance in a group: NULL F*") {
    val rows = Seq("g1" -> 5.0, "g1" -> 5.0, "g2" -> 1.0, "g2" -> 9.0)
    val (_, _, f, _, sig) = run(rows)
    assert(f === None && sig === None)
  }
}
