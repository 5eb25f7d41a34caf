package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LabelPropagation]] (X151) oracles: two triangles joined by one
  * bridge must resolve to TWO communities (X24's components would
  * merge them — the point of the operator), a planted bipartite
  * oscillator's round-3 state is pinned (the synchronous-update
  * contract stated in the scaladoc), and the full sf0.001 graph
  * matches a literal driver replay of the 3 synchronous rounds.
  */
class LabelPropagationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def communities(baskets: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = tmpDir("lpa")
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    LabelPropagation.q192.build(spark, dir).collect().map(r =>
      r.getAs[Long]("community") -> r.getAs[Long]("size")).toMap
  }

  private def edgesToBaskets(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((1000L + i, u), (1000L + i, v))
    }

  /** Driver replay: synchronous rounds, vote = (count desc, lbl asc). */
  private def replay(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val directed = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }
    var labels = directed.map(_._1).distinct.map(n => n -> n).toMap
    (1 to rounds).foreach { _ =>
      labels = directed
        .map { case (src, dst) => (dst, labels(src)) }
        .groupBy(identity).view.mapValues(_.size).toSeq
        .groupBy(_._1._1).view.mapValues { votes =>
          votes.map { case ((_, lbl), c) => (lbl, c) }
            .minBy { case (lbl, c) => (-c, lbl) }._1
        }.toMap
    }
    labels
  }

  test("two triangles joined by a bridge resolve to TWO communities " +
      "(connected components would report one)") {
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val bridge = Seq((3L, 10L))
    val edges = tri1 ++ tri2 ++ bridge
    val out = communities(edgesToBaskets(edges))
    assert(out.size === 2 && out.values.toSeq === Seq(3L, 3L),
      "two 3-node communities despite the bridge")
    val expected = replay(edges, LabelPropagation.Rounds)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(out === expected)
  }

  test("planted bipartite 4-cycle: the synchronous rounds are " +
      "bit-deterministic — q192 equals the driver replay of the same " +
      "3 rounds (oscillation included in the contract)") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val expected = replay(cycle, LabelPropagation.Rounds)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(communities(edgesToBaskets(cycle)) === expected)
  }

  test("q192 at sf0.001 == driver replay of 3 synchronous rounds") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
    val edges = TriangleCount.undirectedEdges(baskets).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val labels = replay(edges, LabelPropagation.Rounds)
    val comms = labels.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = comms.toSeq
      .sortBy { case (c, sz) => (-sz, c) }
      .take(LabelPropagation.TopCommunities).toMap
    val got = LabelPropagation.q192.build(spark, sf0001).collect()
    assert(got.map(_.getAs[Long]("n_communities")).distinct.toSeq ===
      Seq(comms.size.toLong))
    assert(got.map(r => r.getAs[Long]("community") ->
      r.getAs[Long]("size")).toMap === expected)
  }
}
