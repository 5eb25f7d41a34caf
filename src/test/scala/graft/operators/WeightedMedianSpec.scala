package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[WeightedMedian]] (X167) oracles: a planted group where the
  * weighted and row medians DISAGREE (the operator's point), an exact
  * boundary hit (cum·4 == q·W picks that row, not the next), and
  * sf0.001 ≡ a literal driver replay of the integer threshold walk.
  */
class WeightedMedianSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Long, Int, Long)])
      : Map[(String, Int), (Double, Long, Long)] = {
    val dir = tmpDir("wmedian")
    rows.map { case (g, price, k1, k2, w) =>
      (k1, 1L, 1L, k2, w.toDouble, price, 0.0, 0.0, g, "O",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    WeightedMedian.q206.build(spark, dir).collect().map { r =>
      (r.getAs[String]("g"), r.getAs[Int]("pct")) ->
        ((r.getAs[Double]("value"), r.getAs[Long]("weight_at"),
          r.getAs[Long]("weight_total")))
    }.toMap
  }

  test("big quantities on cheap lines pull the weighted median below " +
      "the row median; an exact cum*4 == q*W boundary is INCLUSIVE") {
    // group m: prices 1,2,3 with weights 7,2,1 — row median 2, but
    // weighted median 1 (7 of 10 units moved at price 1)
    val m = Seq(("m", 1.0, 1L, 1, 7L), ("m", 2.0, 2L, 1, 2L),
      ("m", 3.0, 3L, 1, 1L))
    // group b: weights 1,1,2 over prices 10,20,30: W=4; P25 boundary
    // cum*4 = 1*4 = 1*W exactly at the first row → price 10; median
    // cum*4 = 8 >= 2*4 at the second row → 20
    val b = Seq(("b", 10.0, 4L, 1, 1L), ("b", 20.0, 5L, 1, 1L),
      ("b", 30.0, 6L, 1, 2L))
    val out = run(m ++ b)
    assert(out(("m", 50)) === ((1.0, 7L, 10L)))
    assert(out(("m", 75)) === ((2.0, 9L, 10L)))
    assert(out(("b", 25)) === ((10.0, 1L, 4L)),
      "exact boundary row is included, not skipped")
    assert(out(("b", 50)) === ((20.0, 2L, 4L)))
    assert(out(("b", 75)) === ((30.0, 4L, 4L)))
  }

  test("q206 at sf0.001 == literal driver replay") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber", "cast(cast(l_quantity as decimal(18,2)) as long)")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3, r._4))
      val tot = ordered.map(_._5).sum
      val cums = ordered.scanLeft(0L)(_ + _._5).tail
      WeightedMedian.QuartersWanted.map { q4 =>
        val idx = cums.indexWhere(c => c * 4 >= q4 * tot)
        (g, q4 * 25) -> ((ordered(idx)._2, cums(idx), tot))
      }
    }
    val got = WeightedMedian.q206.build(spark, sf0001).collect().map { r =>
      (r.getAs[String]("g"), r.getAs[Int]("pct")) ->
        ((r.getAs[Double]("value"), r.getAs[Long]("weight_at"),
          r.getAs[Long]("weight_total")))
    }.toMap
    assert(got === expected.toMap)
  }
}
