package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[JonckheereTerpstra]] (X236) oracles: hand-computed doubled J and
  * z on a fully separated gradient, the half-credit tie convention,
  * and agreement with a brute-force pairwise driver replay on a
  * scattered fixture.
  */
class JonckheereSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Int, Double)]) // (group score, value)
      : (Long, Int, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("jt")
    obs.zipWithIndex.map { case ((g, v), i) =>
      (i.toLong, 1L, "F", v,
        new Timestamp(86400000L * 19000), s"$g-PRIO")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = JonckheereTerpstra.q268.build(spark, dir).collect()(0)
    (r.getLong(0), r.getInt(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force doubled J + z over all ordered group pairs. */
  private def replay(obs: Seq[(Int, Double)]): (Long, Double) = {
    val groups = obs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val keys = groups.keys.toSeq.sorted
    var j2 = 0L
    for {
      i <- keys; j <- keys if j > i
      x <- groups(i); y <- groups(j)
    } j2 += (if (x < y) 2L else if (x == y) 1L else 0L)
    val n = obs.size.toLong
    val ns = keys.map(groups(_).size.toLong)
    val sn2 = ns.map(g => g.toDouble * g).sum
    val sn23 = ns.map(g => g.toDouble * g * (2.0 * g + 3)).sum
    val varj = (n.toDouble * n * (2.0 * n + 3) - sn23) / 72.0
    val z = (2.0 * j2 - (n.toDouble * n - sn2)) / (4 * math.sqrt(varj))
    (j2, round6(z))
  }

  test("fully separated increasing groups: J is maximal") {
    val obs = Seq((1, 1.0), (1, 2.0), (2, 3.0), (2, 4.0),
      (3, 5.0), (3, 6.0))
    val (n, k, j2, z, _) = run(obs)
    assert((n, k) === ((6L, 3)))
    assert(j2 === 24L) // 3 pairs of groups x 4 wins each, doubled
    val (ej2, ez) = replay(obs)
    assert(j2 === ej2 && z === Some(ez))
  }

  test("cross-group ties earn half credit (doubled J stays integer)") {
    val obs = Seq((1, 1.0), (1, 5.0), (2, 5.0), (2, 9.0))
    // pairs: (1,5):2 + (1,9):2 + (5,5):1 + (5,9):2 = doubled 7
    val (_, _, j2, z, _) = run(obs)
    assert(j2 === 7L)
    val (ej2, ez) = replay(obs)
    assert(j2 === ej2 && z === Some(ez))
  }

  test("scattered 3-group fixture matches the brute-force replay") {
    val vals = Seq(3.1, 7.7, 2.2, 9.9, 5.5, 1.1, 8.8, 4.4, 6.6, 2.2,
      7.7, 3.3)
    val obs = vals.zipWithIndex.map { case (v, i) => (i % 3 + 1, v) }
    val (_, k, j2, z, _) = run(obs)
    assert(k === 3)
    val (ej2, ez) = replay(obs)
    assert(j2 === ej2 && z === Some(ez))
  }
}
