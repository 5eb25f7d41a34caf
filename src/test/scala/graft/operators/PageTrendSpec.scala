package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[PageTrend]] (X234) oracles: the hand-computed z on a perfectly
  * ordered fixture, direction flip, incomplete-block exclusion, and
  * Friedman contrast (q265 significant while direction-blind).
  */
class PageTrendSpec extends SparkSpec {
  import spark.implicits._

  // months × priority counts
  private def run(cells: Seq[(Int, Int, Int)]) // (month, j, count)
      : (Long, Long, Long, Option[Double], Option[Boolean], String) = {
    val dir = tmpDir("pt")
    cells.flatMap { case (m, j, c) =>
      (0 until c).map { i =>
        ((m * 1000000 + j * 10000 + i).toLong, 1L, "F", 1000.0d,
          new Timestamp(Timestamp.valueOf(
            f"2024-$m%02d-15 00:00:00").getTime), s"$j-PRIO")
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = PageTrend.q266.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)),
      r.getString(5))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("perfect increasing order in 4 blocks of k=3: z = 2*sqrt(2)") {
    // counts rise with j in every month: ranks = j, R_j = 4j,
    // L = 56, mu = 48, sigma^2 = 8
    val cells = for (m <- 1 to 4; j <- 1 to 3) yield (m, j, 10 * j)
    val (n, k, l2, z, monotone, dir) = run(cells)
    assert((n, k) === ((4L, 3L)))
    assert(l2 === 112L) // doubled L
    assert(z === Some(round6(8.0 / math.sqrt(8.0))))
    assert(monotone === Some(true) && dir === "increasing")
  }

  test("perfect decreasing order flips the sign and direction") {
    val cells = for (m <- 1 to 4; j <- 1 to 3) yield (m, j, 10 * (4 - j))
    val (_, _, _, z, monotone, dir) = run(cells)
    assert(z === Some(round6(-8.0 / math.sqrt(8.0))))
    assert(monotone === Some(true) && dir === "decreasing")
  }

  test("a month missing one priority is excluded from the blocks") {
    val cells = (for (m <- 1 to 4; j <- 1 to 3)
      yield (m, j, 10 * j)) :+ ((5, 1, 10)) // month 5 has only j=1
    val (n, _, _, _, _, _) = run(cells)
    assert(n === 4L, "incomplete month 5 must not enter")
  }

  test("alternating-order blocks: Friedman-invisible AND trendless") {
    // two months rank (1,2,3), two rank (3,2,1): R_j all equal -> no
    // Friedman signal; Page z = 0 exactly
    val cells = (for (m <- 1 to 2; j <- 1 to 3) yield (m, j, 10 * j)) ++
      (for (m <- 3 to 4; j <- 1 to 3) yield (m, j, 10 * (4 - j)))
    val (_, _, _, z, monotone, dir) = run(cells)
    assert(z === Some(0.0) && monotone === Some(false) && dir === "none")
  }
}
