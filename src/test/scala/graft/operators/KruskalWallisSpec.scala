package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[KruskalWallis]] (X214) oracles: the textbook no-ties H on a
  * planted 3-group table, the tie-corrected variant, and the
  * all-tied degenerate NULL.
  */
class KruskalWallisSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : (Long, Long, Option[Double], Option[Double], Option[Boolean]) = {
    val dir = tmpDir("kw")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = KruskalWallis.q247.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("no ties, 3 groups of 2: H matches the textbook formula") {
    // values 1..6, groups {1,2} {3,4} {5,6} -> rank sums 3, 7, 11
    val out = run(Seq("g1" -> 1d, "g1" -> 2d, "g2" -> 3d, "g2" -> 4d,
      "g3" -> 5d, "g3" -> 6d))
    val h = 12.0 / (6.0 * 7.0) * ((3.0 * 3 + 7.0 * 7 + 11.0 * 11) / 2.0) -
      3.0 * 7.0
    assert(out._1 === 6L && out._2 === 3L)
    assert(out._3 === Some(round6(h)))
    // no ties -> correction 1, adjusted equals raw
    assert(out._4 === out._3)
    // df = 2, crit 5.99: h ~ 4.57 -> not significant
    assert(out._5 === Some(false))
  }

  test("separated groups are significant") {
    // g1 = {1..5}, g2 = {11..15}, g3 = {21..25}: maximal separation
    val rows = (1 to 5).map(i => "g1" -> i.toDouble) ++
      (11 to 15).map(i => "g2" -> i.toDouble) ++
      (21 to 25).map(i => "g3" -> i.toDouble)
    val out = run(rows)
    // df = 2 crit = 5.991: perfectly separated 3x5 gives H = 12.5
    assert(out._3 === Some(12.5))
    assert(out._5 === Some(true))
  }

  test("all values tied: correction 0, adjusted H NULL") {
    val out = run(Seq("g1" -> 7d, "g1" -> 7d, "g2" -> 7d, "g2" -> 7d))
    assert(out._4 === None && out._5 === None)
  }
}
