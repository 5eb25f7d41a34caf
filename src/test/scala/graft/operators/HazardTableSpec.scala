package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HazardTable]] (X200) oracles: a hand-planted three-customer
  * ledger (events, censoring at the horizon, at-risk recursion), the
  * interval-conservation identity Σ(d+c) = |orders|, and q236 at
  * sf0.001 ≡ a driver replay of the whole life table.
  */
class HazardTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def day(d: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      d.toLong * 86400000L)

  private def run(orders: Seq[(Long, Int)])
      : Seq[(Long, Long, Long, Long, Double)] = {
    val dir = tmpDir("hazard")
    orders.zipWithIndex.map { case ((c, d), i) =>
      (i.toLong, c, "O", 1.0, day(d), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    HazardTable.q236.build(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    }.toSeq
  }

  test("hand-planted ledger: events at their gap weeks, censors at " +
      "the horizon, at-risk counts by the reverse recursion") {
    // horizon = day 30. cust 1: orders at 0, 10, 30 -> gaps 10d (w1),
    // 20d (w2), censored 0d (w0). cust 2: orders at 0, 1 -> gap 1d
    // (w0), censored 29d (w4). cust 3: order at 16 -> censored 14d
    // (w2). Intervals: w0: d=1,c=1; w1: d=1; w2: d=1,c=1; w4: c=1.
    // n_risk: w0=6, w1=4, w2=3, w4=1.
    val out = run(Seq((1L, 0), (1L, 10), (1L, 30), (2L, 0), (2L, 1),
      (3L, 16)))
    assert(out === Seq(
      (0L, 6L, 1L, 1L, 1.0 / 6.0),
      (1L, 4L, 1L, 0L, 1.0 / 4.0),
      (2L, 3L, 1L, 1L, 1.0 / 3.0),
      (4L, 1L, 0L, 1L, 0.0)))
  }

  test("interval conservation: every order opens exactly one " +
      "interval (event or censor), so sum(d+c) = |orders|") {
    val out = run(Seq((1L, 0), (1L, 3), (1L, 9), (2L, 5), (4L, 2),
      (4L, 29)))
    assert(out.map(x => x._3 + x._4).sum === 6L)
    assert(out.head._2 === 6L, "week-0 at-risk = all intervals")
  }

  test("q236 at sf0.001 == driver replay of the life table") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").cast("string"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getString(2)))
    def epochDay(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val horizon = rows.map(r => epochDay(r._3)).max
    val intervals = rows.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      val sorted = os.sortBy(o => (o._3, o._2)).map(o => epochDay(o._3))
        .toList
      val events = sorted.sliding(2).collect {
        case Seq(a, b) => ((b - a) / 7, 1L)
      }.toSeq
      events :+ (((horizon - sorted.last) / 7, 0L))
    }
    val byWeek = intervals.groupBy(_._1).toSeq.map { case (w, xs) =>
      (w, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.sortBy(_._1)
    val expected = byWeek.zipWithIndex.map { case ((w, d, c), i) =>
      val nRisk = byWeek.drop(i).map(x => x._2 + x._3).sum
      (w, nRisk, d, c, d.toDouble / nRisk.toDouble)
    }
    val got = HazardTable.q236.build(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected && got.nonEmpty)
  }
}
