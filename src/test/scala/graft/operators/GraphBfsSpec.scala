package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GraphBfs]] (X144) oracles: a planted chain exercises every hop
  * level INCLUDING the horizon cut (dist −1 beyond 3 hops), a planted
  * two-seed graph proves multi-source minimality, and the full
  * sf0.001 graph matches a driver-side BFS replay.
  */
class GraphBfsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** baskets (o, p) written as a lineitem table — each order links
    * all its parts pairwise.
    */
  private def run(baskets: Seq[(Long, Long)]): Map[Int, (Long, Long, Long, Long)] = {
    val dir = tmpDir("bfs")
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    GraphBfs.q185.build(spark, dir).collect().map(r =>
      r.getAs[Int]("dist") -> ((r.getAs[Long]("n_nodes"),
        r.getAs[Long]("min_node"), r.getAs[Long]("max_node"),
        r.getAs[Long]("sum_node")))).toMap
  }

  test("planted chain 0–1–2–3–4–5: every hop level populated, nodes " +
      "past the 3-hop horizon reported as dist = -1, not dropped") {
    // chain edges via 2-part baskets; node 0 is the seed (0 % 97 = 0)
    val out = run(Seq((10L, 0L), (10L, 1L), (11L, 1L), (11L, 2L),
      (12L, 2L), (12L, 3L), (13L, 3L), (13L, 4L), (14L, 4L), (14L, 5L)))
    assert(out(0) === ((1L, 0L, 0L, 0L)))
    assert(out(1) === ((1L, 1L, 1L, 1L)))
    assert(out(2) === ((1L, 2L, 2L, 2L)))
    assert(out(3) === ((1L, 3L, 3L, 3L)))
    assert(out(-1) === ((2L, 4L, 5L, 9L)), "4 and 5 are beyond horizon")
  }

  test("two seeds: distance is the MINIMUM over sources") {
    // seeds 0 and 97; node 50 adjacent to 97 must get dist 1 even
    // though it is far from 0
    val out = run(Seq((10L, 0L), (10L, 1L), (11L, 1L), (11L, 2L),
      (20L, 97L), (20L, 50L)))
    assert(out(0) === ((2L, 0L, 97L, 97L)))
    assert(out(1)._1 === 2L) // nodes 1 and 50
    assert(out(1)._4 === 51L)
  }

  test("q185 at sf0.001 == driver-side BFS replay") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
    val adj = TriangleCount.undirectedEdges(baskets)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dist = scala.collection.mutable.Map.empty[Long, Int]
    adj.keys.filter(_ % 97 == 0).foreach(n => dist(n) = 0)
    var frontier = dist.keySet.toSet
    (1 to GraphBfs.Hops).foreach { h =>
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(n => dist(n) = h)
    }
    val expected = adj.keys.toSeq.map(n => dist.getOrElse(n, -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = GraphBfs.q185.build(spark, sf0001).collect()
      .map(r => r.getAs[Int]("dist") -> r.getAs[Long]("n_nodes")).toMap
    assert(got === expected)
  }
}
