package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MutualKnn]] (X161) oracles: a planted catalog where one-way
  * best-ness is NOT reciprocated (the asymmetry the mutual cut
  * exists to remove) next to a genuinely mutual pair, and sf0.001 ≡
  * a literal driver replay of rank-1 reciprocity.
  */
class MutualKnnSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("an exclusive pair is mutual; a staple that is somebody's " +
      "best neighbor without reciprocating is NOT") {
    // items 1,2 exclusively together ×3 → mutual best pair.
    // item 3 co-occurs only with staple 9 (so 9 is 3's best), but 9's
    // best is 1/2-side traffic? — give 9 heavy co-occurrence with 1
    // so 9's best is 1, breaking reciprocity with 3.
    val baskets = Seq(
      (100L, 1L), (100L, 2L),
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L),
      (103L, 3L), (103L, 9L),
      (104L, 1L), (104L, 9L),
      (105L, 1L), (105L, 9L),
      (106L, 1L), (106L, 9L))
    val dir = tmpDir("mutual")
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = MutualKnn.q201.build(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // 3's best is 9 (its only neighbor), but 9's best is 1:
    // cos²(9,1) = 9e6/(4·6) = 375000 > cos²(9,3) = 1e6/(4·1) = 250000
    // → (3,9) must NOT be mutual
    assert(!out.exists { case (a, b) => Set(a, b) === Set(3L, 9L) })
    // 1's best: cos²(1,2) = 9e6/(6·3) = 500000 > cos²(1,9) = 375000
    // → 1 picks 2; 2's only neighbor is 1 → mutual
    assert(out === Set((1L, 2L)))
  }

  test("q201 at sf0.001 == literal driver replay of rank-1 reciprocity") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byBasket = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val n = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val pairCnt = byBasket.values.flatMap { ps =>
      val sorted = ps.toSeq.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.size)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val directed = pairCnt.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c))
    }
    val best = directed.groupBy(_._1).map { case (item, nbrs) =>
      item -> nbrs.map { case (_, nbr, c) =>
        (nbr, c, c * c * 1000000L / (n(item) * n(nbr)))
      }.minBy { case (nbr, _, cos2) => (-cos2, nbr) }
    }
    val expected = best.flatMap { case (a, (b, c, cos2)) =>
      if (a < b && best.get(b).exists(_._1 == a)) Some((a, b, c, cos2))
      else None
    }.toSet
    val got = MutualKnn.q201.build(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"), r.getAs[Long]("cos2_micro"))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "sf0.001 must exercise at least one mutual pair")
  }
}
