package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[BreslowDay]] (X253) oracles: identical strata scoring T = 0, the
  * hand T on an opposite-ratio fixture (ψ̂ = 1 linear path), the
  * quadratic-root path against a brute-force replay, and the
  * degenerate-margin exclusion.
  */
class BreslowDaySpec extends SparkSpec {
  import spark.implicits._

  /** One (a, b, c, d) cell tuple per month index. */
  private def run(strata: Seq[(Long, Long, Long, Long)])
      : (Long, Option[Double], Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("bd")
    val rows = strata.zipWithIndex.flatMap { case ((a, b, c, d), m) =>
      val day = 19000L + m * 35L // distinct months
      def mk(n: Long, high: Boolean, ok: Boolean) =
        (0L until n).map(i => (m.toLong * 100000 + i, i,
          if (ok) "F" else "O",
          if (high) 200000.0 else 1000.0,
          new Timestamp(86400000L * day), "P"))
      mk(a, high = true, ok = true) ++ mk(b, high = true, ok = false) ++
        mk(c, high = false, ok = true) ++ mk(d, high = false, ok = false)
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = BreslowDay.q284.build(spark, dir).collect()(0)
    (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force BD/Tarone over informative strata. */
  private def replay(strata: Seq[(Long, Long, Long, Long)])
      : (Option[Double], Option[Double]) = {
    val inf = strata.filter { case (a, b, c, d) =>
      val n = a + b + c + d
      a + b > 0 && a + c > 0 && a + b < n && a + c < n
    }
    val sr = inf.map { case (a, b, c, d) =>
      a.toDouble * d / (a + b + c + d) }.sum
    val sss = inf.map { case (a, b, c, d) =>
      b.toDouble * c / (a + b + c + d) }.sum
    if (sr <= 0 || sss <= 0 || inf.size < 2) return (None, None)
    val psi = sr / sss
    val terms = inf.map { case (a, b, c, d) =>
      val (rd, cd, nd) = ((a + b).toDouble, (a + c).toDouble,
        (a + b + c + d).toDouble)
      val aq = 1.0 - psi
      val bq = nd - rd - cd + psi * (rd + cd)
      val cq = -psi * rd * cd
      val e =
        if (math.abs(aq) < 1e-12) rd * cd / nd
        else {
          val disc = math.max(bq * bq - 4 * aq * cq, 0.0)
          val e1 = (-bq + math.sqrt(disc)) / (2 * aq)
          if (e1 >= math.max(0.0, rd + cd - nd) &&
            e1 <= math.min(rd, cd)) e1
          else (-bq - math.sqrt(disc)) / (2 * aq)
        }
      val vinv = 1 / e + 1 / (rd - e) + 1 / (cd - e) +
        1 / (nd - rd - cd + e)
      (a - e, vinv)
    }
    def lane(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(14,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val tBd = lane(terms.map(t => t._1 * t._1 * t._2))
    val sdev = lane(terms.map(_._1))
    val sv = lane(terms.map(t => 1.0 / t._2))
    (Some(round6(tBd)), Some(round6(tBd - sdev * sdev / sv)))
  }

  test("identical strata: common ratio fits perfectly, T = 0") {
    val s = Seq((10L, 10L, 10L, 10L), (10L, 10L, 10L, 10L))
    val (k, tBd, tTar, _, het) = run(s)
    assert(k === 2L)
    assert(tBd === Some(0.0) && tTar === Some(0.0))
    assert(het === Some(false))
  }

  test("opposite ratios around ψ̂ = 1: hand T = 36, heterogeneous") {
    // (20,5,5,20) OR 16 and (5,20,20,5) OR 1/16: ψ̂ = 1 exactly,
    // Ê = 12.5, V = 3.125 in both strata → T = 2·(7.5²/3.125) = 36
    val s = Seq((20L, 5L, 5L, 20L), (5L, 20L, 20L, 5L))
    val (k, tBd, tTar, crit, het) = run(s)
    assert(k === 2L)
    assert(tBd === Some(36.0) && tTar === Some(36.0))
    assert(crit === Some(3.841459))
    assert(het === Some(true))
  }

  test("ψ̂ ≠ 1 quadratic path matches the brute-force replay") {
    val s = Seq((12L, 4L, 6L, 14L), (8L, 9L, 3L, 11L),
      (15L, 2L, 7L, 9L))
    val (k, tBd, tTar, _, _) = run(s)
    val (rBd, rTar) = replay(s)
    assert(k === 3L)
    assert(tBd === rBd && tTar === rTar)
  }

  test("degenerate-margin strata are excluded") {
    // second stratum has no exposed rows at all (a + b = 0)
    val s = Seq((10L, 10L, 10L, 10L), (0L, 0L, 10L, 10L),
      (10L, 10L, 10L, 10L))
    val (k, _, _, _, _) = run(s)
    assert(k === 2L)
  }
}
