package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DiscountLift]] (X189) oracles: hand-planted bands where the
  * lift is an exact ratio, the no-baseline NULL guard, band cuts as
  * decimal compares (0.02 lands in b_low, not a_none), and sf0.001
  * ≡ a driver replay.
  */
class DiscountLiftSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(lines: Seq[(Long, Double, Double)]) // (part, disc, qty)
      : Map[(String, String), (Long, Double, Option[Double])] = {
    val dir = tmpDir("dlift")
    lines.zipWithIndex.map { case ((p, disc, qty), i) =>
      (i.toLong, p, 1L, 1, qty, 1.0, disc, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "p one", "BrandA", "T", 1, 1.0),
      (2L, "p two", "BrandB", "T", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    DiscountLift.q226.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getAs[Double]("mean_qty"),
          Option(r.getAs[Any]("lift_vs_none"))
            .map(_.asInstanceOf[Double])))
    }.toMap
  }

  test("BrandA: baseline mean 2, mid-band mean 6 — lift exactly 3; " +
      "0.02 lands in b_low (decimal boundary)") {
    val out = run(Seq(
      (1L, 0.00, 2.0), (1L, 0.01, 2.0), // a_none, mean 2
      (1L, 0.02, 4.0), //                  b_low boundary row
      (1L, 0.06, 6.0), (1L, 0.10, 6.0))) // c_mid, mean 6
    assert(out(("BrandA", "a_none")) === ((2L, 2.0, Some(1.0))))
    assert(out(("BrandA", "b_low"))._3 === Some(2.0))
    assert(out(("BrandA", "c_mid")) === ((2L, 6.0, Some(3.0))))
  }

  test("a brand with no undiscounted lines has NULL lift") {
    val out = run(Seq((2L, 0.08, 5.0)))
    assert(out(("BrandB", "c_mid")) === ((1L, 5.0, None)))
  }

  test("q226 at sf0.001 ≡ driver replay of cells and lifts") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def d2(x: Double) = BigDecimal(x.toString)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cells = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_discount", "l_quantity").collect()
      .map { r =>
        val disc = d2(r.getDouble(1))
        val band = if (disc < d2(0.02)) "a_none"
          else if (disc < d2(0.06)) "b_low"
          else if (disc < d2(0.11)) "c_mid" else "d_deep"
        ((parts(r.getLong(0)), band), d2(r.getDouble(2)))
      }
      .groupBy(_._1).map { case (k, v) =>
        k -> ((v.length.toLong, v.map(_._2).sum))
      }
    val got = DiscountLift.q226.build(spark, sf0001).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (n, qty) = cells(key)
      assert(r.getLong(2) === n, s"n $key")
      assert(r.getAs[Double]("qty") === qty.toDouble, s"qty $key")
      val base = cells.get((key._1, "a_none"))
      val expectLift =
        if (key._2 == "a_none") Some(1.0)
        else base.collect { case (n0, q0) if q0 > 0 =>
          (qty.toDouble * n0.toDouble) / (n.toDouble * q0.toDouble)
        }
      assert(Option(r.getAs[Any]("lift_vs_none"))
        .map(_.asInstanceOf[Double]) === expectLift, s"lift $key")
    }
  }
}
