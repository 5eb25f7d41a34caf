package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[BowkerSymmetry]] (X242) oracles: symmetric flow scoring χ² = 0,
  * the one-directional cell still forming its pair row (the
  * least/greatest symmetrization), self-transition exclusion, and a
  * hand χ² on an asymmetric fixture.
  */
class BowkerSymmetrySpec extends SparkSpec {
  import spark.implicits._

  /** Per-user event-type chains, hours apart so ordering is fixed. */
  private def run(chains: Map[Long, Seq[String]])
      : (Option[Long], Option[Long], Option[Double], Option[Boolean]) = {
    val dir = tmpDir("bowker")
    val rows = for {
      (u, types) <- chains.toSeq
      (et, i) <- types.zipWithIndex
    } yield (u * 1000 + i, new Timestamp((900000L + i) * 3600000L),
      u, et, 1.0d, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = BowkerSymmetry.q280.build(spark, dir).collect()(0)
    def l(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
    (l(0), l(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(4)) None else Some(r.getBoolean(4)))
  }

  test("perfectly reversible flow: χ² = 0") {
    // a→b x2 and b→a x2 inside one chain
    val out = run(Map(1L -> Seq("a", "b", "a", "b", "a")))
    assert(out._1 === Some(4L) && out._2 === Some(1L))
    assert(out._3 === Some(0.0))
    assert(out._4 === Some(false))
  }

  test("a one-directional cell still forms its pair row") {
    // c→d exists, d→c never does: nab = 1, nba = 0, term = 1
    val out = run(Map(1L -> Seq("a", "b", "a", "b", "a"),
      2L -> Seq("c", "d")))
    assert(out._1 === Some(5L) && out._2 === Some(2L))
    assert(out._3 === Some(1.0))
  }

  test("self-transitions are excluded from the cells") {
    // a,a,b contributes only a→b; the a→a run is not discordant flow
    val out = run(Map(1L -> Seq("a", "a", "b")))
    assert(out._1 === Some(1L) && out._2 === Some(1L))
    assert(out._3 === Some(1.0))
  }

  test("hand χ² on an asymmetric two-pair fixture") {
    // chain: a b a b b a... build a→b x3, b→a x1 via separate users
    val out = run(Map(
      1L -> Seq("a", "b"), 2L -> Seq("a", "b"), 3L -> Seq("a", "b"),
      4L -> Seq("b", "a")))
    // (3-1)^2/(3+1) = 1.0
    assert(out._1 === Some(4L) && out._2 === Some(1L))
    assert(out._3 === Some(1.0))
    // df = 1, crit 3.84: not asymmetric yet
    assert(out._4 === Some(false))
  }

  test("strong asymmetry crosses the bar") {
    val chains = (1L to 20L).map(u => u -> Seq("view", "purchase"))
      .toMap
    val out = run(chains)
    // 20 discordant one-way transitions: χ² = 400/20 = 20 > 3.84
    assert(out._3 === Some(20.0))
    assert(out._4 === Some(true))
  }
}
