package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MarketBasket]] (X125) vs a driver-side brute force over the full
  * sf0.001 lineitem table: pair counts, marginals, the top-100 cut
  * (ties by (a,b)), and support/confidence/lift built with the SAME
  * IEEE double tree — so the comparison is exact, not approximate.
  */
class MarketBasketSpec extends AnyFunSuite with SparkSpec {

  test("q167 == brute force on sf0.001: top-100 rules with exact " +
      "support/confidence/lift") {
    val got = MarketBasket.q167.build(spark, sf0001).collect()

    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val nOrders = baskets.map(_._1).distinct.length.toLong
    val cntI = baskets.groupBy(_._2).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val pairCnt = baskets.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val top = pairCnt.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(MarketBasket.TopRules)

    assert(got.length === top.length)
    got.zip(top).foreach { case (row, ((a, b), c)) =>
      assert(row.getAs[Long]("a") === a)
      assert(row.getAs[Long]("b") === b)
      assert(row.getAs[Long]("pair_cnt") === c)
      val (ca, cb) = (cntI(a), cntI(b))
      assert(row.getAs[Long]("cnt_a") === ca)
      assert(row.getAs[Long]("cnt_b") === cb)
      // same double expression trees as the operator — exact equality
      assert(row.getAs[Double]("support") === c.toDouble / nOrders.toDouble)
      assert(row.getAs[Double]("conf_ab") === c.toDouble / ca.toDouble)
      assert(row.getAs[Double]("conf_ba") === c.toDouble / cb.toDouble)
      assert(row.getAs[Double]("lift") ===
        (nOrders.toDouble * c.toDouble) / (ca.toDouble * cb.toDouble))
    }
  }

  test("pair face is bounded by basket width: sum over baskets of " +
      "k*(k-1)/2, never corpus-quadratic") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val widths = baskets.groupBy(_._1).map(_._2.length)
    val face = widths.map(k => k.toLong * (k - 1) / 2).sum
    val n = baskets.length.toLong
    assert(face < n * 8,
      s"pair face $face should stay a small multiple of |rows| $n " +
        "(widths capped by the schema)")
    assert(widths.max <= 16, "baskets stay narrow in this schema")
  }
}
