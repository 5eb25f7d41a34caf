package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[FanoutProfiler]] (X188) oracles: a planted edge with orphans,
  * childless parents and a hub (max_children = the skew bound), the
  * mean excluding orphan mass, and sf0.001 ≡ a driver replay of all
  * four declared edges.
  */
class FanoutProfilerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("planted edge: hub of 5, two singles, one childless parent, " +
      "three orphan children") {
    val child = (Seq.fill(5)(10L) ++ Seq(11L, 12L) ++ Seq.fill(3)(99L))
      .map(Tuple1(_)).toDF("fk")
    val parent = Seq(10L, 11L, 12L, 13L).map(Tuple1(_)).toDF("pk")
    val r = FanoutProfiler
      .profile(child, "fk", parent, "pk", "t").collect().head
    assert(r.getAs[Long]("n_parents") === 4L)
    assert(r.getAs[Long]("n_children") === 10L)
    assert(r.getAs[Long]("orphan_children") === 3L)
    assert(r.getAs[Long]("childless_parents") === 1L)
    assert(r.getAs[Long]("min_children") === 0L)
    assert(r.getAs[Long]("max_children") === 5L)
    assert(r.getAs[Double]("mean_children") === 7.0 / 4.0)
  }

  test("q225 at sf0.001 ≡ driver replay of every declared edge") {
    val got = FanoutProfiler.q225.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size === FanoutProfiler.Edges.length)
    FanoutProfiler.Edges.foreach { case (edge, ct, fk, pt, pk) =>
      val children = spark.read.parquet(s"$sf0001/$ct.parquet")
        .select(fk).collect().map(_.get(0).asInstanceOf[Number]
          .longValue())
      val parents = spark.read.parquet(s"$sf0001/$pt.parquet")
        .select(pk).collect().map(_.get(0).asInstanceOf[Number]
          .longValue()).distinct
      val perKey = children.groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      val pset = parents.toSet
      val matched = parents.map(p => perKey.getOrElse(p, 0L))
      val orphans = perKey.filterNot(kv => pset(kv._1)).values.sum
      val r = got(edge)
      assert(r.getAs[Long]("n_parents") === parents.length.toLong, edge)
      assert(r.getAs[Long]("n_children") === children.length.toLong,
        edge)
      assert(r.getAs[Long]("orphan_children") === orphans, edge)
      assert(r.getAs[Long]("childless_parents") ===
        matched.count(_ == 0L).toLong, edge)
      assert(r.getAs[Long]("min_children") === matched.min, edge)
      assert(r.getAs[Long]("max_children") === matched.max, edge)
      assert(r.getAs[Double]("mean_children") ===
        (children.length.toLong - orphans).toDouble /
          parents.length.toDouble, edge)
    }
  }
}
