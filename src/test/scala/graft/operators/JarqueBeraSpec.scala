package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[JarqueBera]] (X251) oracles: the centered-moment replay on
  * planted groups, a symmetric fixture scoring skew 0 exactly, a
  * heavy-tailed group crossing the χ²(2) bar, and the zero-variance
  * NULL.
  */
class JarqueBeraSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : Map[String, (Long, Option[Double], Option[Double],
        Option[Double], Option[Boolean])] = {
    val dir = tmpDir("jb")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    JarqueBera.q282.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def replay(vs: Seq[Double])
      : (Option[Double], Option[Double], Option[Double]) = {
    val n = vs.size
    val mean = vs.sum / n
    def lane(f: Double => Double): Double =
      vs.map(v => BigDecimal(f(v - mean)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val (s2, s3, s4) = (lane(d => d * d), lane(d => d * d * d),
      lane(d => d * d * d * d))
    if (s2 <= 0) (None, None, None)
    else {
      val (m2, m3, m4) = (s2 / n, s3 / n, s4 / n)
      val g1 = m3 / math.sqrt(m2 * m2 * m2)
      val g2 = m4 / (m2 * m2) - 3.0
      (Some(round6(g1)), Some(round6(g2)),
        Some(round6(n / 6.0 * (g1 * g1 + g2 * g2 / 4.0))))
    }
  }

  test("moments match the replay; symmetric data has skew 0 exactly") {
    val sym = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val skewed = Seq(1.0, 1.0, 1.0, 2.0, 30.0)
    val out = run(sym.map("s" -> _) ++ skewed.map("k" -> _))
    val (skS, kuS, jbS) = replay(sym)
    assert(out("s")._1 === 5L)
    assert(out("s")._2 === skS && skS === Some(0.0))
    assert((out("s")._3, out("s")._4) === ((kuS, jbS)))
    val (skK, kuK, jbK) = replay(skewed)
    assert((out("k")._2, out("k")._3, out("k")._4) ===
      ((skK, kuK, jbK)))
  }

  test("a heavy-tailed group crosses the bar; a near-normal one does not") {
    // 100 near-normal points (binomial-ish) vs the same + extreme spikes
    val base = (1 to 100).map(i =>
      (1 to 8).map(j =>
        (((i * 2654435761L + j * 40503L) % 97L) % 2L).toInt)
        .sum.toDouble)
    val spiky = base.dropRight(2) ++ Seq(60.0, -60.0)
    val out = run(base.map("n" -> _) ++ spiky.map("t" -> _))
    assert(out("t")._4 === replay(spiky)._3)
    assert(out("t")._5 === Some(true))
    assert(out("n")._4 === replay(base)._3)
    assert(out("n")._5 === Some(false))
  }

  test("constant group: zero variance, NULL statistic") {
    val out = run(Seq("c" -> 7.0, "c" -> 7.0, "c" -> 7.0))
    assert(out("c")._2 === None && out("c")._4 === None)
  }
}
