package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TriangleCount]] (X126) vs a driver-side brute force on planted
  * graphs. The hub + orientation-disagreement cases are the point:
  * degree-ordered orientation only counts a triangle if the wedge pair
  * is ordered by the SAME (degree, id) order the orientation used —
  * the id-ordered wedge join this spec was written against missed
  * every triangle whose two non-apex corners have id order opposite
  * their degree order (advisor's 4-node reproducer below found 0 of 1).
  */
class TriangleCountSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Each undirected edge planted as its own 2-item basket. */
  private def basketsOf(edges: Seq[(Long, Long)]): DataFrame =
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i.toLong, u), (i.toLong, v))
    }.toDF("o", "p")

  private def sparkTriangles(baskets: DataFrame): Seq[(Long, Long, Long)] =
    TriangleCount.triangles(TriangleCount.orientedEdges(baskets))
      .collect().map { r =>
        val s = Seq(r.getLong(0), r.getLong(1), r.getLong(2)).sorted
        (s(0), s(1), s(2))
      }.toSeq

  private def bruteTriangles(
      edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    (for {
      a <- nodes
      b <- nodes if b > a && adj(a)(b)
      c <- nodes if c > b && adj(a)(c) && adj(b)(c)
    } yield (a, b, c)).toSet
  }

  test("advisor reproducer: triangle {1,2,3} + pendant edge 2-4 — " +
      "edge 2-3 orients 3->2 (deg(3)=2 < deg(2)=3) and the triangle " +
      "must still be found") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
    assert(sparkTriangles(basketsOf(edges)) === Seq((1L, 2L, 3L)))
  }

  test("K5 clique from one 5-item basket: C(5,3)=10 triangles, each " +
      "counted exactly once") {
    val baskets = (1L to 5L).map(p => (0L, p)).toDF("o", "p")
    val tris = sparkTriangles(baskets)
    assert(tris.size === 10)
    assert(tris.toSet.size === 10, "a triangle was double-counted")
  }

  test("hub star has no triangles") {
    val edges = (1L to 10L).map(leaf => (100L, leaf))
    assert(sparkTriangles(basketsOf(edges)).isEmpty)
  }

  test("seeded random graph: triangle SET and per-node counts match " +
      "the brute force exactly") {
    // deterministic scattered edge selection over 24 nodes (NOT an
    // `lcg % 3` form — 1103515245 ≡ 0 mod 3, which silently kept
    // every edge and made this a complete graph)
    val edges = for {
      u <- 1L to 24L
      v <- (u + 1) to 24L
      if (u * 37 + v) % 101 < 34
    } yield (u, v)
    val expected = bruteTriangles(edges)
    assert(expected.nonEmpty, "planted graph should contain triangles")
    val got = sparkTriangles(basketsOf(edges))
    assert(got.size === got.toSet.size, "a triangle was double-counted")
    assert(got.toSet === expected)
    // per-corner counts drive local_cc — check them too
    val gotPerNode = got.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    val expPerNode = expected.toSeq
      .flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size }
    assert(gotPerNode === expPerNode)
  }
}
