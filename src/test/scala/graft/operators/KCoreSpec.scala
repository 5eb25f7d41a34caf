package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[KCore]] (X150) oracles: a planted graph where peeling must
  * CASCADE (a node drops below k only after its neighbor is peeled),
  * a K5 that survives intact while a 4-cycle (2-core) dissolves, and
  * a fixpoint proof: the driver peels the sf0.001 graph to
  * convergence and matches q191's fixed 6 rounds exactly.
  */
class KCoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(baskets: Seq[(Long, Long)]): Map[Long, Long] = {
    val dir = tmpDir("kcore")
    baskets.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    KCore.q191.build(spark, dir).collect().map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
  }

  /** Pairwise edges via 2-part baskets, order ids auto-assigned. */
  private def edgesToBaskets(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((1000L + i, u), (1000L + i, v))
    }

  test("K5 survives as its own 3-core (degree 4 each); a 4-cycle and " +
      "a pendant chain dissolve; peeling CASCADES through a node " +
      "whose degree only drops below k after its neighbor is peeled") {
    val k5 = for (u <- 1L to 5L; v <- (u + 1) to 5L) yield (u, v)
    val cycle = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val chain = Seq((20L, 21L), (21L, 22L))
    // cascade: 30 has degree 2 (to node 1 and to 31 — peeled round
    // 1); 31 has degree 3 (30, 1, 2 — survives round 1, drops to 2
    // once 30 peels, gone round 2)
    val cascade = Seq((30L, 1L), (30L, 31L), (31L, 1L), (31L, 2L))
    val out = run(edgesToBaskets(k5 ++ cycle ++ chain ++ cascade))
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.toSet === Set(4L),
      "the surviving 3-core is exactly K5 at degree 4")
  }

  test("q191 at sf0.001 == driver peel-to-FIXPOINT (6 rounds suffice)") {
    val baskets = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p").distinct()
    var edges = TriangleCount.undirectedEdges(baskets).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.toSeq
    var changed = true
    var rounds = 0
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= KCore.K).keySet
      val next = edges.filter { case (u, v) =>
        keep(u) && keep(v)
      }
      changed = next.size != edges.size
      if (changed) rounds += 1
      edges = next
    }
    assert(rounds <= KCore.Rounds,
      s"fixpoint took $rounds rounds — the fixed ${KCore.Rounds} must cover it")
    val expected = edges.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val got = KCore.q191.build(spark, sf0001).collect().map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("core_degree")).toMap
    assert(got === expected)
  }
}
