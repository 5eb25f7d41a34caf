package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Skyline]] (X146) oracles: a planted catalog exercises every
  * dominance case (strict-price, equal-price-strict-size, exact
  * ties both kept), and the full sf0.001 frontier equals the O(n²)
  * brute-force definition.
  */
class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Int)]): Seq[Long] = {
    val dir = tmpDir("skyline")
    rows.map { case (k, pr, sz) => (k, s"part $k", "B1", "T1", sz, pr) }
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Skyline.q187.build(spark, dir).collect()
      .map(_.getAs[Long]("p_partkey")).toSeq
  }

  test("planted dominance cases: cheaper-equal-size dominates, " +
      "equal-price-larger-size dominates, exact ties both survive") {
    val out = run(Seq(
      (1L, 1.0, 5),  // dominated by 2 (same price, bigger)
      (2L, 1.0, 7),  // frontier
      (3L, 2.0, 7),  // dominated by 2 (cheaper, equal size)
      (4L, 0.5, 3),  // frontier (cheapest)
      (5L, 3.0, 10), // frontier (tie with 6 — neither dominates)
      (6L, 3.0, 10), // frontier
      (7L, 2.5, 9))) // frontier
    assert(out === Seq(2L, 4L, 5L, 6L, 7L))
  }

  test("q187 at sf0.001 == brute-force dominance definition") {
    val parts = spark.read.parquet(s"$sf0001/part.parquet")
      .selectExpr("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 10),
        r.getInt(2)))
    val expected = parts.filter { case (_, pi, si) =>
      !parts.exists { case (_, pj, sj) =>
        pj <= pi && sj >= si && (pj < pi || sj > si)
      }
    }.map(_._1).sorted.toSeq
    val got = Skyline.q187.build(spark, sf0001).collect()
      .map(_.getAs[Long]("p_partkey")).toSeq
    assert(got === expected)
  }
}
