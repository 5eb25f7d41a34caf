package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[PageRank]] (X133) oracles: the integer micro-mass recurrence is
  * replayed literally in driver-side Scala on planted graphs and must
  * match EXACTLY (every step is integer div/sum — no tolerance); a
  * symmetric clique is exactly uniform; a star concentrates rank on
  * the hub; truncation loss stays bounded so the total mass is
  * conserved to within the documented slack.
  */
class PageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Each undirected edge planted as its own 2-item basket. */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = tmpDir("pagerank")
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i.toLong, u), (i.toLong, v))
    }.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    PageRank.q175.build(spark, dir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micro"))
      .toMap
  }

  /** Literal driver-side replay of the integer recurrence. */
  private def replay(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val adj = dir.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    val n = deg.size.toLong
    var r = deg.map { case (k, _) => k -> PageRank.Mass / n }
    (1 to PageRank.Iters).foreach { _ =>
      val inflow = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      dir.foreach { case (u, v) => inflow(v) += r(u) / deg(u) }
      r = deg.map { case (k, _) =>
        k -> (PageRank.Mass * 15L / 100L / n + inflow(k) * 85L / 100L)
      }
    }
    r
  }

  test("symmetric K4 clique: all four ranks identical (exact)") {
    val edges = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val got = run(edges)
    assert(got.size === 4)
    assert(got.values.toSet.size === 1, "clique ranks must be uniform")
    assert(got === replay(edges))
  }

  test("star: the hub's rank dominates every leaf, exact replay match") {
    val edges = (1L to 8L).map(leaf => (100L, leaf))
    val got = run(edges)
    val exp = replay(edges)
    assert(got === exp)
    val hub = got(100L)
    (1L to 8L).foreach(l => assert(got(l) < hub,
      s"leaf $l must rank below the hub"))
  }

  test("irregular graph: exact integer match with the driver replay, " +
      "mass conserved within truncation slack") {
    // triangle {1,2,3} + tail 3-4-5 + pendant 2-6
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (2L, 6L))
    val got = run(edges)
    val exp = replay(edges)
    assert(got === exp)
    val total = got.values.sum
    assert(total <= PageRank.Mass)
    // per round each node loses < d(u) + 100 micro-units to integer
    // truncation (div by out-degree, the *85//100 damp, the base div) —
    // with Mass = 1e12 the drift is parts-per-billion
    assert(total > PageRank.Mass - PageRank.Mass / 1000L,
      s"mass $total drifted more than 0.1% from ${PageRank.Mass}")
  }

  test("q175 at sf0.001 matches the driver replay on the real graph") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    val edges = baskets.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.distinct
    val exp = replay(edges)
    val topExp = exp.toSeq.sortBy { case (node, r) => (-r, node) }
      .take(PageRank.TopNodes)
    val got = PageRank.q175.build(spark, sf0001).collect()
    assert(got.length === topExp.length)
    got.zip(topExp).foreach { case (row, (node, r)) =>
      assert(row.getAs[Long]("node") === node)
      assert(row.getAs[Long]("rank_micro") === r)
    }
  }
}
