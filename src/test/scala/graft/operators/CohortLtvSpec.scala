package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[CohortLtv]] (X186) oracles: a planted two-cohort ledger whose
  * (cohort, age) cells and cumulative per-customer LTV are
  * hand-checkable, revenue conservation across the matrix, and
  * sf0.001 ≡ a driver replay.
  */
class CohortLtvSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(month: Int): Timestamp =
    Timestamp.valueOf(f"2024-${month}%02d-15 00:00:00")

  private def run(orders: Seq[(Long, Int, Double)])
      : Seq[(Timestamp, Int, Long, Long, Long, Double, Double)] = {
    val dir = tmpDir("ltv")
    orders.zipWithIndex.map { case ((c, m, r), i) =>
      (i.toLong, c, "O", r, ts(m), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    CohortLtv.q223.build(spark, dir).collect().map { r =>
      (r.getAs[Timestamp]("cohort"), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))
    }.toSeq
  }

  test("two cohorts: cells, active counts and the cumulative " +
      "per-customer LTV path are the hand numbers") {
    val out = run(Seq(
      // cohort Jan: cust 1 buys Jan 100 + Mar 50; cust 2 buys Jan 30
      (1L, 1, 100.0), (1L, 3, 50.0), (2L, 1, 30.0),
      // cohort Feb: cust 3 buys Feb 10
      (3L, 2, 10.0)))
    val jan = Timestamp.valueOf("2024-01-01 00:00:00")
    val feb = Timestamp.valueOf("2024-02-01 00:00:00")
    assert(out === Seq(
      (jan, 0, 2L, 2L, 2L, 130.0, 65.0),
      (jan, 2, 2L, 1L, 1L, 50.0, 90.0),
      (feb, 0, 1L, 1L, 1L, 10.0, 10.0)))
  }

  test("q223 at sf0.001: matrix revenue reconciles to the ledger and " +
      "cells ≡ driver replay") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    def monthOf(t: Timestamp): (Int, Int) = {
      val ld = t.toLocalDateTime.toLocalDate
      (ld.getYear, ld.getMonthValue)
    }
    def d2(x: Double) = BigDecimal(x.toString)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val firsts = orders.groupBy(_._1).map { case (c, os) =>
      c -> os.map(o => monthOf(o._2)).min
    }
    val cells = orders.groupBy { o =>
      val cohort = firsts(o._1)
      val m = monthOf(o._2)
      (cohort, (m._1 - cohort._1) * 12 + (m._2 - cohort._2))
    }.map { case (k, os) =>
      k -> ((os.size.toLong, os.map(_._1).distinct.size.toLong,
        os.map(o => d2(o._3)).sum))
    }
    val got = CohortLtv.q223.build(spark, sf0001).collect()
    assert(got.length === cells.size)
    var totalRev = BigDecimal(0)
    got.foreach { r =>
      val cohort = monthOf(r.getAs[Timestamp]("cohort"))
      val key = (cohort, r.getInt(1))
      val (n, active, rev) = cells(key)
      assert(r.getLong(4) === n, s"orders $key")
      assert(r.getLong(3) === active, s"active $key")
      assert(math.abs(r.getDouble(5) - rev.toDouble) < 1e-6, s"rev $key")
      totalRev += rev
    }
    assert(totalRev === orders.map(o => d2(o._3)).sum,
      "matrix reconciles to the ledger")
  }
}
