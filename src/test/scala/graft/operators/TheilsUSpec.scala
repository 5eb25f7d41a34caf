package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[TheilsU]] (X222) oracles: U = 1 when weekday determines the
  * type, U = 0 under independence, NULL when the type is constant.
  */
class TheilsUSpec extends SparkSpec {
  import spark.implicits._

  /** Plant events as (type, epoch-day) — dow = day % 7. */
  private def run(rows: Seq[(String, Int)])
      : (Long, Double, Double, Option[Double]) = {
    val dir = tmpDir("tu")
    rows.zipWithIndex.map { case ((ty, day), i) =>
      (i.toLong, new Timestamp(day.toLong * 86400000L), i.toLong,
        ty, 1.0d, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = TheilsU.q255.build(spark, dir).collect()(0)
    (r.getLong(0), r.getDouble(1), r.getDouble(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("weekday determines type: U = 1, I = H(X) = ln 2") {
    // dow 0 (epoch day 0) -> always click; dow 1 -> always view
    val out = run(Seq.fill(4)(("click", 0)) ++ Seq.fill(4)(("view", 1)))
    assert(out._1 === 8L)
    assert(out._2 === out._3, "I = H(X) at full determination")
    assert(out._4 === Some(1.0))
  }

  test("independent type and weekday: U = 0") {
    val rows = for {
      ty <- Seq("click", "view"); day <- Seq(0, 1); _ <- 1 to 2
    } yield (ty, day)
    val out = run(rows)
    // primitive == (a decimal-lane -0.0 must still count as zero)
    assert(out._3 == 0.0 && out._4.exists(_ == 0.0))
  }

  test("constant type: H(X) = 0, U NULL") {
    val out = run(Seq(("click", 0), ("click", 1), ("click", 2)))
    assert(out._2 == 0.0 && out._4 === None)
  }
}
