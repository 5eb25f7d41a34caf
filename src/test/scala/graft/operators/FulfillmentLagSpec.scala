package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[FulfillmentLag]] (X187) oracles: bucket boundaries inclusive at
  * 7/30/90 days, the lag is to the LAST line shipped, lineless
  * orders surface as `z_unshipped` (not dropped), and sf0.001 ≡ a
  * driver replay of the census.
  */
class FulfillmentLagSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dayTs(d: Int): Timestamp =
    new Timestamp(Timestamp.valueOf("2024-03-01 00:00:00").getTime +
      d.toLong * 86400000L)

  private def run(orders: Seq[(Long, String)],
      lines: Seq[(Long, Int, Int)]) // (okey, linenum, shipday)
      : Map[(String, String), (Long, Long, Option[Long], Double)] = {
    val dir = tmpDir("fulfill")
    orders.map { case (k, pri) =>
      (k, 1L, "O", 1.0, dayTs(0), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    lines.map { case (k, ln, sd) =>
      (k, 1L, 1L, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", dayTs(sd))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    FulfillmentLag.q224.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3),
          Option(r.getAs[Any]("max_lag_days"))
            .map(_.asInstanceOf[Long]),
          r.getDouble(5)))
    }.toMap
  }

  test("boundaries: 7 days is still a_week, 8 is b_month; the lag " +
      "is to the LAST line; a lineless order is z_unshipped") {
    val out = run(
      orders = Seq((1L, "P"), (2L, "P"), (3L, "P"), (4L, "P")),
      lines = Seq(
        (1L, 1, 2), (1L, 2, 7), // last ship day 7 → a_week
        (2L, 1, 8), //                              b_month
        (3L, 1, 91))) //                            d_over
    // order 4 has no lines
    assert(out(("P", "a_week")) === ((1L, 2L, Some(7L), 0.25)))
    assert(out(("P", "b_month")) === ((1L, 1L, Some(8L), 0.25)))
    assert(out(("P", "d_over")) === ((1L, 1L, Some(91L), 0.25)))
    assert(out(("P", "z_unshipped")) === ((1L, 0L, None, 0.25)))
  }

  test("q224 at sf0.001 ≡ driver replay of the census") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val lastShip = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
      .groupBy(_._1).map { case (k, v) =>
        (k, (v.map(_._2.getTime).max, v.size.toLong))
      }
    def dayOf(ms: Long): Long = Math.floorDiv(ms, 86400000L)
    val bucketed = orders.map { case (k, pri, od) =>
      lastShip.get(k) match {
        case None => (pri, "z_unshipped", 0L, None: Option[Long])
        case Some((ship, nl)) =>
          val lag = dayOf(ship) - dayOf(od.getTime)
          val b = if (lag <= 7) "a_week" else if (lag <= 30) "b_month"
            else if (lag <= 90) "c_quarter" else "d_over"
          (pri, b, nl, Some(lag))
      }
    }
    val expect = bucketed.groupBy(b => (b._1, b._2)).map {
      case (key, xs) =>
        key -> ((xs.length.toLong, xs.map(_._3).sum,
          xs.flatMap(_._4).sorted.lastOption))
    }
    val totals = bucketed.groupBy(_._1).map { case (p, xs) =>
      p -> xs.length.toLong
    }
    val got = FulfillmentLag.q224.build(spark, sf0001).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (n, nl, maxLag) = expect(key)
      assert(r.getLong(2) === n, s"n $key")
      assert(r.getLong(3) === nl, s"lines $key")
      assert(Option(r.getAs[Any]("max_lag_days"))
        .map(_.asInstanceOf[Long]) === maxLag, s"max $key")
      assert(r.getDouble(5) ===
        n.toDouble / totals(key._1).toDouble, s"share $key")
    }
  }
}
