package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LinkPrediction]] (X168) vs a driver-side brute force. The
  * anti-join and the cn-before-pa ranking are the points under test:
  * an existing edge must never be predicted, and a candidate sharing
  * MORE neighbors must outrank one whose endpoints are merely
  * higher-degree.
  */
class LinkPredictionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Each undirected edge planted as its own 2-item basket. */
  private def basketsOf(edges: Seq[(Long, Long)]): DataFrame =
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i.toLong, u), (i.toLong, v))
    }.toDF("o", "p")

  private def run(edges: Seq[(Long, Long)], nq: Int, topK: Int)
      : Seq[(Long, Long, Long, Long, Int)] =
    LinkPrediction.predict(basketsOf(edges), nq, topK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq

  /** Driver brute force: for each of the nq (deg desc, id) top nodes,
    * CN over all non-adjacent v (cn > 0), ranked (cn desc, pa desc, v).
    */
  private def brute(edges: Seq[(Long, Long)], nq: Int, topK: Int)
      : Seq[(Long, Long, Long, Long, Int)] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, ns) => k -> ns.size.toLong }
    val queries = deg.toSeq.sortBy { case (n, d) => (-d, n) }.take(nq)
    queries.flatMap { case (u, du) =>
      adj.keys.toSeq
        .filter(v => v != u && !adj(u)(v))
        .map(v => (v, (adj(u) & adj(v)).size.toLong, du * deg(v)))
        .filter(_._2 > 0)
        .sortBy { case (v, cn, pa) => (-cn, -pa, v) }
        .take(topK).zipWithIndex
        .map { case ((v, cn, pa), i) => (u, v, cn, pa, i + 1) }
    }.sortBy(r => (r._1, r._5))
  }

  test("path 1-2-3: the only prediction is (1,3) and (3,1), cn=1, " +
      "pa=1; the existing edges are never predicted") {
    val out = run(Seq((1L, 2L), (2L, 3L)), 3, 10)
    assert(out === Seq((1L, 3L, 1L, 1L, 1), (3L, 1L, 1L, 1L, 1)))
  }

  test("K4 clique: everything is adjacent, zero predictions") {
    val edges = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    assert(run(edges, 4, 10).isEmpty)
  }

  test("cn outranks pa: v1 shares two neighbors with u, v2 shares one " +
      "but has far higher degree — v1 must rank first") {
    // u=1 adjacent to w1=2, w2=3; v1=4 adjacent to both w's;
    // v2=5 adjacent to w1 only, plus a hub fan making deg(5) large.
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (5L, 2L)) ++
      (10L to 16L).map(x => (5L, x))
    val forU = run(edges, 20, 10).filter(_._1 == 1L)
    assert(forU.head._2 === 4L, "the 2-common-neighbor candidate wins")
    assert(forU.head._3 === 2L)
    val v5 = forU.find(_._2 == 5L).get
    assert(v5._3 === 1L && v5._5 > 1)
  }

  test("seeded scattered graph ≡ driver brute force (queries, " +
      "candidates, scores, ranks)") {
    val edges = (for {
      u <- 1L to 20L
      v <- (u + 1) to 20L
    } yield (u, v)).filter { case (u, v) =>
      (u * 2654435761L + v * 40503L) % 7 < 2
    }
    assert(run(edges, 5, 4) === brute(edges, 5, 4))
  }
}
