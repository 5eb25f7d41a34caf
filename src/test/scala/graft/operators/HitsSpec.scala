package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Hits]] (X159) oracles: a planted bipartite catalog where degree
  * and authority DISAGREE (the mutual-reinforcement point — a part in
  * few but big baskets outranks a part in more but thin ones), and the
  * sf0.001 graph ≡ a literal driver replay of the integer half-rounds.
  */
class HitsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def replay(edges: Seq[(Long, Long)])
      : Map[Long, Long] = {
    val orders = edges.map(_._1).distinct
    val m = Hits.Mass
    var hubs = orders.map(_ -> m / orders.size).toMap
    var auth = Map.empty[Long, Long]
    def normalize(raw: Map[Long, Long]): Map[Long, Long] = {
      val s = raw.values.sum
      raw.view.mapValues(v => v * m / s).toMap
    }
    (1 to Hits.Rounds).foreach { _ =>
      auth = normalize(edges.groupBy(_._2).view
        .mapValues(_.map(e => hubs(e._1)).sum).toMap)
      hubs = normalize(edges.groupBy(_._1).view
        .mapValues(_.map(e => auth(e._2)).sum).toMap)
    }
    auth
  }

  test("a part in ONE five-line basket outranks a part in two " +
      "singleton baskets — authority follows hub mass, not degree") {
    // basket 1 = {10,11,12,13,14}; baskets 2,3 = {20} each
    val edges = (10L to 14L).map(p => (1L, p)) ++
      Seq((2L, 20L), (3L, 20L))
    val dir = tmpDir("hits")
    edges.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Hits.q199.build(spark, dir).collect().map(r =>
      r.getAs[Long]("part") -> r.getAs[Long]("authority_micro")).toMap
    val expected = replay(edges)
    assert(out === expected.view.filterKeys(out.contains).toMap)
    // part 20 sits in 2 baskets, parts 10-14 in 1 each — yet the
    // five-line basket's hub mass wins (replay: ~172M vs ~138M micro)
    assert(out(10L) === out(14L))
    assert(out(10L) > out(20L),
      "authority follows hub mass, not raw basket count")
  }

  test("q199 at sf0.001 == literal driver replay of the integer rounds") {
    val edges = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .selectExpr("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val auth = replay(edges)
    val deg = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = auth.toSeq.map { case (p, a) => (p, a, deg(p)) }
      .sortBy { case (p, a, _) => (-a, p) }.take(Hits.TopParts)
    val got = Hits.q199.build(spark, sf0001).collect().map(r =>
      (r.getAs[Long]("part"), r.getAs[Long]("authority_micro"),
        r.getAs[Long]("n_orders"))).toSeq
    assert(got === expected)
  }
}
