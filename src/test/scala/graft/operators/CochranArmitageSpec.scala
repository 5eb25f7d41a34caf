package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[CochranArmitage]] (X228) oracles: driver-replayed z on a planted
  * monotone gradient, sign flip under the reversed gradient, and the
  * all-success degenerate NULL.
  */
class CochranArmitageSpec extends SparkSpec {
  import spark.implicits._

  private def run(groups: Seq[(Int, Int, Int)]) // (score, n, successes)
      : (Long, Long, Long, Option[Double], Option[Boolean]) = {
    val dir = tmpDir("ca")
    groups.flatMap { case (w, n, r) =>
      (0 until n).map { i =>
        ((w * 100000 + i).toLong, 1L,
          if (i < r) "F" else "O", 1000.0d,
          new Timestamp(86400000L * 19000), s"$w-PRIO")
      }
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val row = CochranArmitage.q260.build(spark, dir).collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2),
      if (row.isNullAt(3)) None else Some(row.getDouble(3)),
      if (row.isNullAt(4)) None else Some(row.getBoolean(4)))
  }

  private def replay(groups: Seq[(Int, Int, Int)]): Double = {
    val n = groups.map(_._2.toLong).sum
    val r = groups.map(_._3.toLong).sum
    val swr = groups.map(g => g._1.toLong * g._3).sum
    val swn = groups.map(g => g._1.toLong * g._2).sum
    val sw2n = groups.map(g => g._1.toLong * g._1 * g._2).sum
    val u = n.toDouble * swr - r.toDouble * swn
    val varz = r.toDouble * (n - r) *
      (n.toDouble * sw2n - swn.toDouble * swn) / n
    BigDecimal(u / math.sqrt(varz))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("falling success gradient: z matches the replay, negative") {
    val groups = Seq((1, 10, 9), (2, 10, 5), (3, 10, 1))
    val (n, r, k, z, sig) = run(groups)
    assert((n, r, k) === ((30L, 15L, 3L)))
    assert(z === Some(replay(groups)))
    assert(z.get < 0 && sig === Some(true))
  }

  test("reversed gradient flips the sign exactly") {
    val groups = Seq((1, 10, 1), (2, 10, 5), (3, 10, 9))
    val (_, _, _, z, _) = run(groups)
    assert(z === Some(replay(groups)))
    assert(z.get > 0)
  }

  test("all orders fulfilled: zero variance -> NULL") {
    val (_, r, _, z, sig) = run(Seq((1, 5, 5), (2, 5, 5)))
    assert(r === 10L && z === None && sig === None)
  }
}
