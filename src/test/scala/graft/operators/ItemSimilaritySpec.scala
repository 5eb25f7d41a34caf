package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ItemSimilarity]] (X154) oracles: a planted catalog where raw
  * co-count and cosine DISAGREE on the ranking (the normalization is
  * the operator's point — a ubiquitous staple item co-occurs with
  * everything but is similar to nothing), micro-unit arithmetic checked
  * by hand, and the sf0.001 graph ≡ a literal driver replay.
  */
class ItemSimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(baskets: Seq[(Long, Long)])
      : Map[(Long, Int), (Long, Long, Long)] = {
    val dir = tmpDir("itemsim")
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ItemSimilarity.q195.build(spark, dir).collect().map { r =>
      (r.getAs[Long]("item"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("nbr"), r.getAs[Long]("c"),
          r.getAs[Long]("cos2_micro")))
    }.toMap
  }

  test("normalization beats raw counts: a staple in every basket " +
      "co-occurs most but ranks below the exclusive partner") {
    // items 1,2 always together (3 baskets, nothing else); staple 9 in
    // all 5 baskets; item 3 appears twice, once with 9 alone
    val baskets = Seq(
      (100L, 1L), (100L, 2L), (100L, 9L),
      (101L, 1L), (101L, 2L), (101L, 9L),
      (102L, 1L), (102L, 2L), (102L, 9L),
      (103L, 3L), (103L, 9L),
      (104L, 3L), (104L, 9L))
    val out = run(baskets)
    // item 1: cos²(1,2) = 9·10⁶/(3·3) = 1000000 > cos²(1,9) =
    // 9·10⁶/(3·5) = 600000 — despite equal raw co-counts (3)
    assert(out((1L, 1)) === ((2L, 3L, 1000000L)))
    assert(out((1L, 2)) === ((9L, 3L, 600000L)))
    // staple 9 co-occurs with 3 twice: cos² = 4·10⁶/(2·5) = 400000
    assert(out((9L, 3)) === ((3L, 2L, 400000L)))
  }

  test("q195 at sf0.001 == literal driver replay") {
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
    val expected = directed.groupBy(_._1).flatMap { case (item, nbrs) =>
      nbrs.map { case (_, nbr, c) =>
        (item, nbr, c, c * c * 1000000L / (n(item) * n(nbr)))
      }.sortBy { case (_, nbr, _, cos2) => (-cos2, nbr) }
        .take(ItemSimilarity.TopK).zipWithIndex
        .map { case ((_, nbr, c, cos2), i) =>
          (item, i + 1) -> ((nbr, c, cos2))
        }
    }
    val got = ItemSimilarity.q195.build(spark, sf0001).collect().map { r =>
      (r.getAs[Long]("item"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("nbr"), r.getAs[Long]("c"),
          r.getAs[Long]("cos2_micro")))
    }.toMap
    assert(got === expected)
  }
}
