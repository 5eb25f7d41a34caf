package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[BrunnerMunzel]] (X259) oracles: the placement replay on tied and
  * untied fixtures, the p̂ direction reading, symmetric arms scoring
  * p̂ = ½ / T = 0, the unequal-spread case q149's variance would
  * mis-model, and the degenerate NULLs.
  */
class BrunnerMunzelSpec extends SparkSpec {
  import spark.implicits._

  private def run(obs: Seq[(Long, Double)])
      : (Long, Long, Option[Double], Option[Double],
        Option[Boolean]) = {
    val dir = tmpDir("bm")
    obs.zipWithIndex.map { case ((u, v), i) =>
      (i.toLong, new Timestamp(86400000L * 19000 + i * 1000L), u,
        "et", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = BrunnerMunzel.q290.build(spark, dir).collect()(0)
    def d(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (r.getLong(0), r.getLong(1), d(2), d(3),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Midrank placement replay (the lawstat-style formulation). */
  private def replay(obs: Seq[(Long, Double)])
      : (Option[Double], Option[Double]) = {
    val a = obs.filter(_._1 % 2 == 0).map(_._2)
    val b = obs.filter(_._1 % 2 == 1).map(_._2)
    val all = a ++ b
    def midrank(pool: Seq[Double])(v: Double): Double =
      pool.count(_ < v) + (pool.count(_ == v) + 1) / 2.0
    val (na, nb) = (a.size, b.size)
    if (na == 0 || nb == 0) return (None, None)
    val ra = a.map(midrank(all))
    val rb = b.map(midrank(all))
    val pa = a.zip(a.map(midrank(a))).zip(ra)
      .map { case ((_, rw), r) => r - rw }
    val pb = b.zip(b.map(midrank(b))).zip(rb)
      .map { case ((_, rw), r) => r - rw }
    // the operator's exact doubled-placement tree:
    // v = (Σ(2p)² − (Σ2p)²/n) / (4(n−1)) over exact longs
    def vvar(p: Seq[Double]): Option[Double] =
      if (p.size < 2) None
      else {
        val p2 = p.map(x => math.round(2 * x))
        val sp = p2.sum
        val sq = p2.map(x => x * x).sum
        Some((sq.toDouble - sp.toDouble * sp / p.size) /
          (4.0 * (p.size - 1)))
      }
    val pHat = (rb.sum / nb - (nb + 1) / 2.0) / na
    val t = for {
      va <- vvar(pa); vb <- vvar(pb)
      if na * va + nb * vb > 0
    } yield na.toDouble * nb * (rb.sum / nb - ra.sum / na) /
      ((na + nb) * math.sqrt(na * va + nb * vb))
    (Some(round6(pHat)), t.map(round6))
  }

  test("no ties: statistic and p̂ match the replay; direction reads") {
    // odd arm stochastically larger -> p_hat > 0.5, T > 0
    val obs = Seq((0L, 1.0), (0L, 2.0), (0L, 5.0), (0L, 3.0),
      (1L, 4.0), (1L, 6.0), (1L, 7.0), (1L, 8.0))
    val (na, nb, p, t, _) = run(obs)
    val (rp, rt) = replay(obs)
    assert((na, nb) === ((4L, 4L)))
    assert(p === rp && t === rt)
    assert(p.get > 0.5 && t.get > 0)
  }

  test("cross-arm ties: placements match the replay") {
    val obs = Seq((0L, 1.0), (0L, 2.0), (0L, 2.0), (1L, 2.0),
      (1L, 3.0), (1L, 3.0), (0L, 4.0), (1L, 4.0))
    val (_, _, p, t, _) = run(obs)
    val (rp, rt) = replay(obs)
    assert(p === rp && t === rt)
  }

  test("mirror-symmetric arms: p̂ = 1/2 exactly, T = 0") {
    val obs = (1 to 10).flatMap(i =>
      Seq((0L, i.toDouble), (1L, i.toDouble)))
    val (_, _, p, t, sig) = run(obs)
    assert(p === Some(0.5))
    assert(t === Some(0.0))
    assert(sig === Some(false))
  }

  test("unequal spreads, shifted location: still flagged") {
    // tight high-ish arm INSIDE a wild arm's range: the
    // Behrens-Fisher shape (complete separation would zero the
    // placement variances instead - the known BM degenerate)
    val obs = (1 to 20).map(i => (1L, 69.0 + (i % 3))) ++
      (1 to 20).map(i => (0L, i.toDouble * 7 % 90))
    val (_, _, p, t, sig) = run(obs)
    val (rp, rt) = replay(obs)
    assert(p === rp && t === rt)
    assert(p.get > 0.5)
    assert(sig === Some(true))
  }

  test("all values tied: zero placement variance, NULL T") {
    val obs = Seq((0L, 5.0), (0L, 5.0), (1L, 5.0), (1L, 5.0))
    val (_, _, p, t, sig) = run(obs)
    assert(p === Some(0.5))
    assert(t === None && sig === None)
  }
}
