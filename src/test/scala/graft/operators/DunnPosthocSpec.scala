package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[DunnPosthoc]] (X244) oracles: the midrank z replay on planted
  * groups (with and without ties), the Bonferroni critical value
  * switching with m = k(k−1)/2, and pair ordering.
  */
class DunnPosthocSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : Array[(String, String, Long, Long, Option[Double], Double,
        Option[Boolean])] = {
    val dir = tmpDir("dunn")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    DunnPosthoc.q272.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5),
        if (r.isNullAt(6)) None else Some(r.getBoolean(6)))
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Midrank z for one (a, b) pair over the COMBINED ranking. */
  private def replay(rows: Seq[(String, Double)], ga: String,
      gb: String): Double = {
    val all = rows.map(_._2)
    val n = all.size.toDouble
    def midrank(v: Double): Double =
      all.count(_ < v) + (all.count(_ == v) + 1) / 2.0
    def meanRank(g: String): Double = {
      val vs = rows.filter(_._1 == g).map(_._2)
      vs.map(midrank).sum / vs.size
    }
    val ties3 = all.groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val varFac = (n * (n + 1) - ties3 / (n - 1)) / 12.0
    val (na, nb) = (rows.count(_._1 == ga).toDouble,
      rows.count(_._1 == gb).toDouble)
    round6((meanRank(ga) - meanRank(gb)) /
      math.sqrt(varFac * (1 / na + 1 / nb)))
  }

  test("k = 2, no ties: z matches the replay, m = 1 uses z(0.975)") {
    val rows = Seq("g1" -> 1.0, "g1" -> 2.0, "g1" -> 3.0,
      "g2" -> 4.0, "g2" -> 5.0, "g2" -> 6.0)
    val out = run(rows)
    assert(out.length === 1)
    val (ga, gb, na, nb, z, crit, sig) = out(0)
    assert((ga, gb) === (("g1", "g2")))
    assert((na, nb) === ((3L, 3L)))
    assert(z === Some(replay(rows, "g1", "g2")))
    assert(crit === 1.959964)
    // maximal separation of 3v3: |z| = 1.963961 > 1.959964
    assert(sig === Some(true))
  }

  test("k = 3 with cross-group ties: all pairs match the replay, " +
      "m = 3 raises the bar") {
    val rows = Seq("g1" -> 1.0, "g1" -> 2.0, "g1" -> 2.0,
      "g2" -> 2.0, "g2" -> 3.0, "g2" -> 4.0,
      "g3" -> 4.0, "g3" -> 5.0, "g3" -> 6.0)
    val out = run(rows)
    assert(out.length === 3)
    assert(out.map(p => (p._1, p._2)).toSeq ===
      Seq(("g1", "g2"), ("g1", "g3"), ("g2", "g3")))
    for ((ga, gb, _, _, z, crit, _) <- out) {
      assert(z === Some(replay(rows, ga, gb)))
      assert(crit === round6(2.3939797998185104))
    }
  }

  test("identical groups: z = 0, never significant") {
    val rows = Seq("g1" -> 5.0, "g1" -> 7.0, "g2" -> 5.0, "g2" -> 7.0)
    val out = run(rows)
    assert(out(0)._5 === Some(0.0))
    assert(out(0)._7 === Some(false))
  }
}
