package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[MantelHaenszel]] (X229) oracles: driver-replayed OR_MH + RBG CI
  * on planted strata, the equal-stratum-OR consistency property, and
  * the zero-cell NULL.
  */
class MantelHaenszelSpec extends SparkSpec {
  import spark.implicits._

  // one stratum = (month, a, b, c, d): exposed = price 200000,
  // unexposed = 100000; fulfilled = 'F'
  private def run(strata: Seq[(Int, Int, Int, Int, Int)])
      : (Long, Option[Double], Option[Double], Option[Double]) = {
    val dir = tmpDir("mh")
    strata.flatMap { case (m, a, b, c, dd) =>
      val ts = new Timestamp(Timestamp.valueOf(
        f"2024-$m%02d-15 00:00:00").getTime)
      (Seq.fill(a)((200000.0d, "F")) ++ Seq.fill(b)((200000.0d, "O")) ++
        Seq.fill(c)((100000.0d, "F")) ++ Seq.fill(dd)((100000.0d, "O")))
        .map { case (price, st) => (ts, price, st) }
    }.zipWithIndex.map { case ((ts, price, st), i) =>
      (i.toLong, 1L, st, price, ts, "3-MEDIUM")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = MantelHaenszel.q261.build(spark, dir).collect()(0)
    (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def replay(strata: Seq[(Int, Int, Int, Int, Int)])
      : (Double, Double, Double) = {
    def dsum(xs: Seq[Double]): Double =
      xs.map(BigDecimal(_).setScale(14, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val terms = strata.map { case (_, a, b, c, d) =>
      val n = (a + b + c + d).toDouble
      (a * d / n, b * c / n, (a + d) / n, (b + c) / n)
    }
    val sr = dsum(terms.map(_._1)); val ss = dsum(terms.map(_._2))
    val spr = dsum(terms.map(t => t._3 * t._1))
    val spsqr = dsum(terms.map(t => t._3 * t._2 + t._4 * t._1))
    val sqs = dsum(terms.map(t => t._4 * t._2))
    val or = sr / ss
    val v = spr / (2 * sr * sr) + spsqr / (2 * sr * ss) +
      sqs / (2 * ss * ss)
    (or, math.exp(math.log(or) - 1.959964 * math.sqrt(v)),
      math.exp(math.log(or) + 1.959964 * math.sqrt(v)))
  }

  test("two uneven strata: OR_MH and the RBG CI match the replay") {
    val strata = Seq((1, 8, 2, 4, 6), (2, 3, 7, 1, 9))
    val (nS, or, lo, hi) = run(strata)
    val (eOr, eLo, eHi) = replay(strata)
    assert(nS === 2L)
    assert(or === Some(round6(eOr)))
    assert(lo === Some(round6(eLo)) && hi === Some(round6(eHi)))
  }

  test("equal stratum ORs (2.25 in both months) pool to exactly 2.25 " +
      "even though the exposure mix differs wildly") {
    val strata = Seq((1, 90, 10, 40, 10), (2, 10, 40, 10, 90))
    val (_, or, lo, hi) = run(strata)
    assert(or === Some(2.25))
    assert(lo.get < 2.25 && hi.get > 2.25)
  }

  test("no exposed-fulfilled anywhere: sum R = 0 -> NULL estimate") {
    val (_, or, lo, hi) = run(Seq((1, 0, 5, 5, 5)))
    assert(or === None && lo === None && hi === None)
  }
}
