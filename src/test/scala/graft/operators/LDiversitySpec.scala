package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LDiversity]] (X148) oracles: a planted homogeneous group fails
  * the l bar with a 100 % dominant share while a diverse one passes,
  * and the micro-unit share arithmetic is exact.
  */
class LDiversitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("planted groups: homogeneous fails l, diverse passes, " +
      "dominant share exact in micro-units") {
    val dir = tmpDir("ldiv")
    var id = 0L
    def ev(g: String, hod: Int, user: Long) = {
      id += 1
      (id, Timestamp.valueOf(f"2024-01-01 $hod%02d:15:00"), user, g,
        1.0, "{}")
    }
    // homogeneous: 8 events, ONE user → l=1, share 1.0
    val homo = (1 to 8).map(_ => ev("homo", 3, 42L))
    // diverse: 6 events over 5 users (user 1 twice) → l=5, top share
    // = round(1e6·2/6) = (2e6·2+6) div 12 = 333333
    val div = Seq(1L, 1L, 2L, 3L, 4L, 5L).map(u => ev("div", 7, u))
    (homo ++ div)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = LDiversity.q189.build(spark, dir).collect().map(r =>
      (r.getAs[String]("g"), r.getAs[Int]("hod")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("l_distinct"),
          r.getAs[Boolean]("meets_l"),
          r.getAs[Long]("top_share_micro")))).toMap
    assert(out(("homo", 3)) === ((8L, 1L, false, 1000000L)))
    assert(out(("div", 7)) === ((6L, 5L, true, 333333L)))
  }

  test("q189 at sf0.001: meets_l consistent with l_distinct, shares " +
      "in (0, 1e6], n >= l_distinct") {
    val rows = LDiversity.q189.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, meets, share) = (r.getAs[Long]("n"),
        r.getAs[Long]("l_distinct"), r.getAs[Boolean]("meets_l"),
        r.getAs[Long]("top_share_micro"))
      assert(meets === (l >= LDiversity.L))
      assert(n >= l && l >= 1)
      assert(share > 0 && share <= 1000000L)
    }
  }
}
