package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DpRelease]] (X147) oracles: the threshold table is a valid
  * inverse CDF of the truncated two-sided geometric (monotone,
  * symmetric, zero-centered), the noise lookup replays exactly on
  * the driver, and |noise| never exceeds the truncation bound.
  */
class DpReleaseSpec extends AnyFunSuite with SparkSpec {

  private def noiseOf(u: Long): Int =
    -DpRelease.B + DpRelease.Thresholds.count(u >= _)

  test("threshold table: monotone non-decreasing, 2B entries, " +
      "median u maps to zero noise, symmetric tails") {
    val ts = DpRelease.Thresholds
    assert(ts.size === 2 * DpRelease.B)
    assert(ts === ts.sorted)
    assert(noiseOf(500000L) === 0, "the distribution is zero-centered")
    // symmetry: P(noise = k) == P(noise = -k) ⇔ threshold gaps mirror
    val gaps = (ts :+ 1000000L).zip(0L +: ts).map { case (a, b) => a - b }
    gaps.take(DpRelease.B).zip(gaps.reverse.take(DpRelease.B))
      .foreach { case (lo, hi) => assert(math.abs(lo - hi) <= 1,
        "tail masses must mirror (±1 from rounding)") }
  }

  test("q188 at sf0.001 == driver replay of the seeded mechanism; " +
      "|noise| <= B") {
    val counts = spark.read.parquet(s"$sf0001/events.parquet")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = DpRelease.q188.build(spark, sf0001).collect()
      .map(r => r.getAs[String]("g") -> r.getAs[Long]("noisy_count"))
      .toMap
    assert(got.keySet === counts.keySet)
    counts.foreach { case (g, n) =>
      val u = ((n % 1000003L) * 8121L + 28411L) % 1000000L
      val expected = n + noiseOf(u)
      assert(got(g) === expected, s"type $g")
      assert(math.abs(got(g) - n) <= DpRelease.B)
    }
  }
}
