package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ApproxTriangles]] (X134) oracles: the sparsified count is EXACT
  * on the deterministically-sampled edge set (driver-side LCG replay +
  * brute force), and the DOULION estimate lands within the
  * 1/√(p³·T) error regime on the real sf0.01 graph.
  */
class ApproxTrianglesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keptDriver(u: Long, v: Long): Boolean = {
    val key = ((u % 1000003L) * 1009L + (v % 1000003L)) % 1000003L
    (key * 1103515245L + 12345L) % 1000000L <
      1000000L / ApproxTriangles.Denom
  }

  test("sampled-graph triangle count == driver-side brute force on " +
      "the SAME deterministic edge subset") {
    // seeded graph, each edge its own 2-item basket
    val edges = (for {
      u <- 1L to 40L
      v <- (u + 1) to 40L
      if (u * 37 + v) % 101 < 34 // ~1/3 density, scattered
    } yield (u, v)).toSeq
    val dir = tmpDir("approxtri")
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      Seq((i.toLong, u), (i.toLong, v))
    }.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val sampled = edges.filter { case (u, v) => keptDriver(u, v) }
    assert(sampled.nonEmpty && sampled.size < edges.size,
      "the sample predicate must thin the planted graph")
    val adj = sampled.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val brute = (for {
      a <- nodes
      b <- nodes if b > a && adj(a)(b)
      c <- nodes if c > b && adj(a)(c) && adj(b)(c)
    } yield 1).size.toLong

    val row = ApproxTriangles.q176.build(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_edges") === edges.size.toLong)
    assert(row.getAs[Long]("n_edges_sampled") === sampled.size.toLong)
    assert(row.getAs[Long]("tri_sampled") === brute)
    assert(row.getAs[Long]("tri_est") ===
      brute * ApproxTriangles.Scale)
  }

  test("DOULION estimate within the error regime of the exact count " +
      "at sf0.01 (p^3 * T >> 1 there)") {
    val sf001 = "/root/testdata/sf0.01"
    val baskets = graft.sources.Tables(spark, sf001, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val exact = TriangleCount.triangles(
      graft.Checkpoints.eager(TriangleCount.orientedEdges(baskets)))
      .count()
    val est = ApproxTriangles.q176.build(spark, sf001)
      .collect()(0).getAs[Long]("tri_est")
    assert(exact > 0)
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr < 0.35,
      s"estimate $est vs exact $exact (rel err $relErr)")
  }
}
