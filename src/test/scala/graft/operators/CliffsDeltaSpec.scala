package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[CliffsDelta]] (X217) oracles: hand-counted dominance pairs on a
  * planted two-arm table, the magnitude bands, and the one-empty-arm
  * NULL.
  */
class CliffsDeltaSpec extends SparkSpec {
  import spark.implicits._

  /** Plant events with explicit (arm, value); arm 0 = even user_id. */
  private def run(rows: Seq[(Int, Double)])
      : (Long, Long, Long, Long, Long, Option[Double], Option[String]) = {
    val dir = tmpDir("cd")
    rows.zipWithIndex.map { case ((arm, v), i) =>
      (i.toLong, new Timestamp(19700L * 86400000L + i * 1000L),
        (2 * i + arm).toLong, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = CliffsDelta.q250.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      if (r.isNullAt(6)) None else Some(r.getString(6)))
  }

  test("hand-counted pairs: A={3,3,4}, B={1,2,3}") {
    val out = run(Seq(0 -> 3d, 0 -> 3d, 0 -> 4d,
      1 -> 1d, 1 -> 2d, 1 -> 3d))
    // gt: 3>1,3>2 (x2 threes) + 4>1,4>2,4>3 = 7; eq: 3=3 (x2); lt: 0
    assert((out._1, out._2, out._3, out._4, out._5) ===
      ((3L, 3L, 7L, 0L, 2L)))
    assert(out._6 === Some(0.777778))
    assert(out._7 === Some("large"))
  }

  test("identical arms: delta 0, negligible") {
    val out = run(Seq(0 -> 1d, 0 -> 2d, 1 -> 1d, 1 -> 2d))
    assert(out._6.exists(_ == 0.0))
    assert(out._7 === Some("negligible"))
  }

  test("empty arm: delta NULL") {
    val out = run(Seq(0 -> 1d, 0 -> 2d))
    assert(out._2 === 0L)
    assert(out._6 === None && out._7 === None)
  }
}
