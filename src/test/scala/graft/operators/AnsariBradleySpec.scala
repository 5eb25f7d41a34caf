package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[AnsariBradley]] (X255) oracles: hand tent scores on a tiny
  * fixture, the block-average tie convention against a brute-force
  * replay, the tails-vs-center dispersion flag, and the all-tied
  * NULL.
  */
class AnsariBradleySpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Double)])
      : (Long, Long, Option[Double], Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("ab")
    obs.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, new Timestamp(86400000L * 19000 + i * 1000L), u,
        "et", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = AnsariBradley.q286.build(spark, dir).collect()(0)
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), d(2), d(3), d(4),
      if (r.isNullAt(5)) None else Some(r.getBoolean(5)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Brute-force tent scores with block-average ties. */
  private def replay(obs: Seq[(Long, Double)])
      : (Double, Double, Option[Double]) = {
    val sorted = obs.map(_._2).sorted
    val n = sorted.size
    def tent(i: Int) = math.min(i, n + 1 - i) // 1-based
    val a = obs.filter(_._1 % 2 == 0).map(_._2)
    val b = obs.filter(_._1 % 2 == 1).map(_._2)
    def lane(xs: Seq[Double]) = xs.map(BigDecimal(_).setScale(14,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    // per-block lanes with the operator's exact trees: (ta·S)/t, S²/t
    val blocks = obs.map(_._2).distinct.map { v =>
      val lo = sorted.count(_ < v) + 1
      val hi = sorted.count(_ <= v)
      val sBlk = (lo to hi).map(tent).sum.toLong
      val t = hi - lo + 1
      val ta = a.count(_ == v)
      (ta.toDouble * sBlk / t, sBlk.toDouble * sBlk / t)
    }
    val ab = lane(blocks.map(_._1))
    val sa2 = lane(blocks.map(_._2))
    val stot = sorted.indices.map(i => tent(i + 1)).sum.toDouble
    val ex = a.size * stot / n
    val vr = a.size.toDouble * b.size *
      (sa2 - stot * stot / n) / (n.toDouble * (n - 1))
    (round6(ab), round6(ex),
      if (vr > 0) Some(round6((ab - ex) / math.sqrt(vr))) else None)
  }

  test("no ties {1,4} vs {2,3}: hand scores 1,2,2,1") {
    // arm a holds both extremes: AB_a = 1 + 1 = 2, E = 2*6/4 = 3
    val obs = Seq((0L, 1.0), (0L, 4.0), (1L, 2.0), (1L, 3.0))
    val (na, nb, ab, ex, z, _) = run(obs)
    assert((na, nb) === ((2L, 2L)))
    assert(ab === Some(2.0))
    assert(ex === Some(3.0))
    val (rab, rex, rz) = replay(obs)
    assert((ab, ex, z) === ((Some(rab), Some(rex), rz)))
  }

  test("ties across arms: block-average scores match the replay") {
    val obs = Seq((0L, 1.0), (0L, 2.0), (0L, 2.0), (1L, 2.0),
      (1L, 3.0), (1L, 3.0), (0L, 4.0), (1L, 4.0))
    val (_, _, ab, ex, z, _) = run(obs)
    val (rab, rex, rz) = replay(obs)
    assert((ab, ex, z) === ((Some(rab), Some(rex), rz)))
  }

  test("one arm in the tails: dispersion flagged, z negative") {
    val center = (1 to 30).map(i => (1L, 50.0 + (i % 5)))
    val tails = (1 to 15).map(i => (0L, i.toDouble)) ++
      (1 to 15).map(i => (0L, 100.0 + i))
    val obs = center ++ tails
    val (_, _, _, _, z, flag) = run(obs)
    val (_, _, rz) = replay(obs)
    assert(z === rz)
    assert(z.get < 0)
    assert(flag === Some(true))
  }

  test("all values tied: zero score variance, NULL z") {
    val obs = Seq((0L, 5.0), (0L, 5.0), (1L, 5.0), (1L, 5.0))
    val (_, _, _, _, z, flag) = run(obs)
    assert(z === None && flag === None)
  }
}
