package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ShapleyAttribution]] (X193) oracles: hand-planted exposure
  * classes with exact rational φ, the efficiency axiom (φ_v + φ_c =
  * v(full) − v(∅)) checked in EXACT rational arithmetic on the
  * driver, the dummy axiom (a channel adding nothing gets 0), the
  * missing-class NULL guard, and sf0.001 ≡ a driver replay.
  */
class ShapleyAttributionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** (user, types...) — one event per type per user. */
  private def run(users: Seq[(Long, Seq[String])])
      : Map[String, (Option[Long], Option[Long], Option[Double])] = {
    val df = users.flatMap { case (u, tys) =>
      tys.zipWithIndex.map { case (ty, i) =>
        (u * 100 + i, new Timestamp(1704067200000L + i * 1000L), u, ty,
          1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("shapley")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    ShapleyAttribution.q229.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((
        Option(r.getAs[Any]("n_sessions")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("n_conv")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Any]("value")).map(_.asInstanceOf[Double])))
    }.toMap
  }

  test("planted classes: v00=0, v10=1/2, v01=1/4, v11=1 — exact φ " +
      "and the efficiency identity in rationals") {
    val users = Seq[(Long, Seq[String])](
      (1L, Seq("signup")), (2L, Seq("signup")), // 00: 0/2
      (3L, Seq("view", "purchase")), (4L, Seq("view")), // 10: 1/2
      (5L, Seq("click", "purchase")), (6L, Seq("click")),
      (7L, Seq("click")), (8L, Seq("click")), // 01: 1/4
      (9L, Seq("view", "click", "purchase"))) // 11: 1/1
    val out = run(users)
    assert(out("class_v0c0") === ((Some(2L), Some(0L), Some(0.0))))
    assert(out("class_v1c0")._3 === Some(0.5))
    assert(out("class_v0c1")._3 === Some(0.25))
    assert(out("class_v1c1")._3 === Some(1.0))
    // φ_v = (1/2 - 0)/2 + (1 - 1/4)/2 = 1/4 + 3/8 = 5/8
    // φ_c = (1/4 - 0)/2 + (1 - 1/2)/2 = 1/8 + 1/4 = 3/8
    assert(out("shapley_view")._3 === Some(0.625))
    assert(out("shapley_click")._3 === Some(0.375))
    // efficiency (exact rationals): 5/8 + 3/8 = 1 = v11 - v00
    assert(BigDecimal(5) / 8 + BigDecimal(3) / 8 === BigDecimal(1))
  }

  test("dummy axiom: click never changes conversion — φ_click 0") {
    val users = Seq[(Long, Seq[String])](
      (1L, Seq("signup")), (2L, Seq("signup", "purchase")), // 00: 1/2
      (3L, Seq("view", "purchase")), (4L, Seq("view")), // 10: 1/2
      (5L, Seq("click", "purchase")), (6L, Seq("click")), // 01: 1/2
      (7L, Seq("view", "click", "purchase")),
      (8L, Seq("view", "click"))) // 11: 1/2
    val out = run(users)
    assert(out("shapley_click")._3 === Some(0.0))
    assert(out("shapley_view")._3 === Some(0.0))
  }

  test("missing exposure class: φ is NULL, census rows still emit") {
    val users = Seq[(Long, Seq[String])](
      (1L, Seq("view", "purchase")), (2L, Seq("click")))
    val out = run(users)
    assert(out("shapley_view")._3 === None)
    assert(out("shapley_click")._3 === None)
    assert(out("class_v1c0")._1 === Some(1L))
  }

  test("q229 at sf0.001 ≡ driver replay over the session cut") {
    val rows = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val bySession = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._2.getTime, e._3))
      var sid = 0L
      var last: Option[Long] = None
      ordered.map { e =>
        if (last.exists(l => (e._2.getTime - l) / 1000.0 > 1800) ||
          last.isEmpty) sid += 1
        last = Some(e._2.getTime)
        ((u, sid), e._4)
      }
    }.groupBy(_._1).toSeq.map { case (_, es) =>
      val tys = es.map(_._2).toSet
      ((tys("view"), tys("click")), tys("purchase"))
    }
    val census = bySession.groupBy(_._1).map { case (k, v) =>
      k -> ((v.size.toLong, v.count(_._2).toLong))
    }
    val got = ShapleyAttribution.q229.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    census.foreach { case ((v, c), (n, cv)) =>
      val row = got(s"class_v${if (v) 1 else 0}c${if (c) 1 else 0}")
      assert(row.getAs[Long]("n_sessions") === n)
      assert(row.getAs[Long]("n_conv") === cv)
    }
    if (census.size == 4) {
      def rate(v: Boolean, c: Boolean): Double = {
        val (n, cv) = census((v, c))
        cv.toDouble / n.toDouble
      }
      val phiV = (rate(true, false) - rate(false, false)) / 2 +
        (rate(true, true) - rate(false, true)) / 2
      assert(got("shapley_view").getAs[Double]("value") === phiV)
    }
  }
}
