package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[CramersV]] (X219) oracles: V = 1 on a planted perfect
  * association, V = 0 on planted independence, and the degenerate
  * one-level NULL — each checked through the full q252 surface
  * (both audited pairs planted).
  */
class CramersVSpec extends SparkSpec {
  import spark.implicits._

  /** Plant orders as (priority, status) pairs and events as
    * (type, epoch-day) pairs, then run q252.
    */
  private def run(orders: Seq[(String, String)],
      events: Seq[(String, Int)])
      : Map[String, (Long, Long, Long, Double, Option[Double])] = {
    val dir = tmpDir("cv")
    orders.zipWithIndex.map { case ((pri, st), i) =>
      (i.toLong, i.toLong, st, 100.0d,
        new Timestamp(19700L * 86400000L), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    events.zipWithIndex.map { case ((ty, day), i) =>
      (i.toLong, new Timestamp((19700L + day) * 86400000L), i.toLong,
        ty, 1.0d, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    CramersV.q252.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    }.toMap
  }

  test("perfect association reads V = 1; independence reads V = 0") {
    // orders: P1 always 'A', P2 always 'B' (2x2 diagonal, chi2 = N)
    val orders = Seq.fill(5)("P1" -> "A") ++ Seq.fill(5)("P2" -> "B")
    // events: both types uniform over two weekdays -> independent
    val events = (for {
      ty <- Seq("click", "view"); day <- Seq(0, 1); _ <- 1 to 3
    } yield (ty, day))
    val out = run(orders, events)
    val (n, r, c, chi2, v) = out("priority_x_status")
    assert((n, r, c) === ((10L, 2L, 2L)))
    assert(chi2 === 10.0 && v === Some(1.0))
    val (ne, _, _, chiE, vE) = out("type_x_dow")
    assert(ne === 12L && chiE === 0.0 && vE === Some(0.0))
  }

  test("single-level factor: V is NULL (min(r,c) = 1)") {
    val out = run(Seq.fill(4)("P1" -> "A"),
      Seq(("click", 0), ("view", 1)))
    assert(out("priority_x_status")._5 === None)
  }
}
