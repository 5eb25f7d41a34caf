package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PointInTimeJoin]] (X163) oracles: a planted history where the
  * point-in-time attribution differs from BOTH the own-order and the
  * current-dimension attribution (the leakage the operator exists to
  * prevent), half-open same-day semantics, and sf0.001 ≡ a literal
  * driver replay of the carried-attribute sweep.
  */
class PointInTimeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def day(d: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("a shipment after a priority change attributes to the " +
      "point-in-time priority — not its own order's, not the current") {
    val dir = tmpDir("pit")
    // customer 1: LOW (day 1, order 10) -> HIGH (day 5, order 11) ->
    // LOW (day 9, order 12)
    Seq((10L, 1L, "F", 100.0, day(1), "3-LOW"),
      (11L, 1L, "F", 100.0, day(5), "1-HIGH"),
      (12L, 1L, "F", 100.0, day(9), "3-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 10's items: ship day 2 (PIT = LOW = own = current),
    // ship day 6 (PIT = HIGH != own LOW, != current LOW),
    // order 11's item: ship day 9 (PIT = LOW != own HIGH; = current)
    Seq((10L, 1, day(2), 10.0), (10L, 2, day(6), 20.0),
      (11L, 1, day(9), 40.0))
      .map { case (ok, ln, ts, price) =>
        (ok, 1L, 1L, ln, 1.0, price, 0.0, 0.0, "N", "O", ts)
      }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = PointInTimeJoin.q203.build(spark, dir).collect().map { r =>
      r.getAs[String]("priority") -> ((r.getAs[Long]("n_items"),
        r.getAs[Double]("revenue_pit"),
        Option(r.getAs[Any]("revenue_pit_and_own")),
        Option(r.getAs[Any]("revenue_pit_and_current"))))
    }.toMap
    // HIGH bucket: only the day-6 shipment (20.0); own was LOW (null
    // overlap), current is LOW (null overlap)
    assert(out("1-HIGH") === ((1L, 20.0, None, None)))
    // LOW bucket: day-2 (own+current agree, 10.0) and day-9 shipment
    // of the HIGH order (own disagrees, current agrees → 40.0)
    assert(out("3-LOW") === ((2L, 50.0, Some(10.0), Some(50.0))))
  }

  test("q203 at sf0.001 == literal driver replay") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .selectExpr("o_custkey", "o_orderkey", "o_orderdate",
        "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))
    val items = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber", "l_shipdate",
        "cast(cast(l_extendedprice as decimal(18,2)) * " +
          "(cast(1 as decimal(18,2)) - " +
          "cast(l_discount as decimal(18,2))) as string) as rev")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2),
        BigDecimal(r.getString(3))))
    val byOrder = orders.map(o => o._2 -> o).toMap
    val byCust = orders.groupBy(_._1)
    def opensOf(cust: Long): Seq[(Long, Long, String)] = {
      val ordered = byCust(cust).sortBy(o => (o._3.getTime, o._2))
      ordered.zipWithIndex.filter { case (o, i) =>
        i == 0 || ordered(i - 1)._4 != o._4
      }.map { case (o, _) => (o._3.getTime, o._2, o._4) }
    }
    val current = byCust.view.mapValues(os =>
      os.maxBy(o => (o._3.getTime, o._2))._4).toMap
    case class Agg(var n: Long = 0, var pit: BigDecimal = 0,
      var own: Option[BigDecimal] = None,
      var cur: Option[BigDecimal] = None)
    val acc = scala.collection.mutable.Map.empty[String, Agg]
    items.foreach { case (okey, _, ship, rev) =>
      val (cust, _, _, ownAttr) = byOrder(okey)
      // an open at the same instant sorts BEFORE any fact (kind 0 < 1);
      // a shipment before the first dimension version → 0-NONE
      val pitAttr = opensOf(cust)
        .filter(o => o._1 <= ship.getTime)
        .maxByOption(o => (o._1, o._2)).map(_._3).getOrElse("0-NONE")
      val a = acc.getOrElseUpdate(pitAttr, Agg())
      a.n += 1; a.pit += rev
      if (ownAttr == pitAttr) a.own = Some(a.own.getOrElse(BigDecimal(0)) + rev)
      if (current(cust) == pitAttr)
        a.cur = Some(a.cur.getOrElse(BigDecimal(0)) + rev)
    }
    val got = PointInTimeJoin.q203.build(spark, sf0001).collect().map { r =>
      r.getAs[String]("priority") -> ((r.getAs[Long]("n_items"),
        r.getAs[Double]("revenue_pit"),
        Option(r.getAs[Any]("revenue_pit_and_own"))
          .map(_.asInstanceOf[Double]),
        Option(r.getAs[Any]("revenue_pit_and_current"))
          .map(_.asInstanceOf[Double])))
    }.toMap
    val expected = acc.map { case (k, a) =>
      k -> ((a.n, a.pit.toDouble, a.own.map(_.toDouble),
        a.cur.map(_.toDouble)))
    }.toMap
    assert(got === expected)
  }
}
