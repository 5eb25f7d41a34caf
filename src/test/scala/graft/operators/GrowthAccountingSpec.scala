package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GrowthAccounting]] (X191) oracles: every movement planted
  * individually (new, resurrected, expansion, contraction, churn),
  * the bridge identity holds EXACTLY on every row including the
  * post-window churn month, and sf0.001 asserts bridge_ok on every
  * month plus spot-replays the totals.
  */
class GrowthAccountingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(month: Int): Timestamp =
    Timestamp.valueOf(f"2024-${month}%02d-10 00:00:00")

  private def run(orders: Seq[(Long, Int, Double)])
      : Map[Long, (Double, Double, Double, Double, Double, Double,
        Boolean)] = {
    val dir = tmpDir("growth")
    orders.zipWithIndex.map { case ((c, m, r), i) =>
      (i.toLong, c, "O", r, ts(m), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    GrowthAccounting.q228.build(spark, dir).collect().map { r =>
      r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))
    }.toMap
  }

  test("each movement planted: new, expansion, contraction, churn, " +
      "resurrection — and the bridge identity holds on every month") {
    // cust 1: Jan 100, Feb 150 (expansion 50), Mar 120 (contraction 30)
    // cust 2: Jan 40, gone Feb (churn 40), back Mar 25 (resurrected)
    // cust 3: new in Feb 10
    val out = run(Seq(
      (1L, 1, 100.0), (1L, 2, 150.0), (1L, 3, 120.0),
      (2L, 1, 40.0), (2L, 3, 25.0),
      (3L, 2, 10.0)))
    val jan = 2024L * 12 + 0
    val (tJ, nJ, rJ, eJ, cJ, chJ, okJ) = out(jan)
    assert((tJ, nJ, rJ, eJ, cJ, chJ, okJ) ===
      ((140.0, 140.0, 0.0, 0.0, 0.0, 0.0, true)))
    val (tF, nF, rF, eF, cF, chF, okF) = out(jan + 1)
    assert((tF, nF, rF, eF, cF, chF, okF) ===
      ((160.0, 10.0, 0.0, 50.0, 0.0, 40.0, true)))
    val (tM, nM, rM, eM, cM, chM, okM) = out(jan + 2)
    assert((tM, nM, rM, eM, cM, chM, okM) ===
      ((145.0, 0.0, 25.0, 0.0, 30.0, 10.0, true)))
    // the post-window month: everything churns, identity still exact
    val (tA, _, _, _, _, chA, okA) = out(jan + 3)
    assert(tA === 0.0 && chA === 145.0 && okA)
  }

  test("q228 at sf0.001: bridge_ok on EVERY month; totals replay") {
    def d2(x: Double) = BigDecimal(x.toString)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val ld = r.getTimestamp(1).toLocalDateTime.toLocalDate
        (ld.getYear * 12L + ld.getMonthValue - 1, d2(r.getDouble(2)))
      }
    val totals = orders.groupBy(_._1)
      .map { case (m, os) => m -> os.map(_._2).sum }
    val got = GrowthAccounting.q228.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getBoolean(7), s"bridge identity month ${r.getLong(0)}")
      val t = totals.getOrElse(r.getLong(0), BigDecimal(0))
      assert(math.abs(r.getDouble(1) - t.toDouble) < 1e-6,
        s"total month ${r.getLong(0)}")
    }
  }
}
