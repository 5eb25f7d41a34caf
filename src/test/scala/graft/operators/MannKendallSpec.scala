package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MannKendall]] (X202) oracles: hand-checkable S on planted
  * monotone / tied / flat series, the tie-corrected variance
  * identity, and q237 at sf0.001 ≡ a driver fold of the full
  * statistic (bit-for-bit z).
  */
class MannKendallSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(series: Seq[(String, Int, Int)])
      : Map[String, (Long, Long, Long, Option[Double],
        Option[Boolean])] = {
    val dir = tmpDir("mk")
    series.flatMap { case (ty, day, c) =>
      (0 until c).map { i =>
        (ty, new Timestamp(Timestamp.valueOf("2024-01-01 06:00:00")
          .getTime + day.toLong * 86400000L + i * 1000L),
          (day * 10000 + i).toLong, 1L)
      }
    }.toDF("event_type", "ts", "event_id", "user_id")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    MannKendall.q237.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  /** Driver fold mirroring the operator's double tree. */
  private def expected(xs: Seq[Long])
      : (Long, Long, Option[Double], Option[Boolean]) = {
    val n = xs.length
    val s = (for { i <- xs.indices; j <- i + 1 until n }
      yield math.signum(xs(j).compare(xs(i))).toLong).sum
    val tie = xs.groupBy(identity).values
      .map(g => g.size.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val var18 = n.toLong * (n - 1) * (2 * n + 5) - tie
    if (var18 <= 0) (s, var18, None, None)
    else {
      val z =
        if (s > 0) (s.toDouble - 1.0) / math.sqrt(var18.toDouble / 18.0)
        else if (s < 0)
          (s.toDouble + 1.0) / math.sqrt(var18.toDouble / 18.0)
        else 0.0
      (s, var18, Some(z), Some(math.abs(z) > MannKendall.Z975))
    }
  }

  test("strictly increasing series: S = n(n-1)/2, trend detected") {
    val out = run((0 until 20).map(d => ("up", d, d + 1)))
    val (n, s, var18, z, t) = (out("up")._1, out("up")._2,
      out("up")._3, out("up")._4, out("up")._5)
    assert(n === 20L && s === 190L)
    assert(var18 === 20L * 19 * 45, "no ties -> full variance")
    assert(z.get > MannKendall.Z975 && t.get)
  }

  test("flat series: every pair tied, variance numerator exactly 0, " +
      "guarded NULLs") {
    val out = run((0 until 15).map(d => ("flat", d, 3)))
    val (_, s, var18, z, t) = (0, out("flat")._2, out("flat")._3,
      out("flat")._4, out("flat")._5)
    assert(s === 0L && var18 === 0L && z.isEmpty && t.isEmpty)
  }

  test("alternating series: S near 0, no trend; tie correction " +
      "matches the hand formula") {
    val xs = (0 until 30).map(d => if (d % 2 == 0) 2 else 3)
    val out = run(xs.zipWithIndex.map { case (c, d) => ("alt", d, c) })
    val (s, var18, z, t) = (out("alt")._2, out("alt")._3,
      out("alt")._4, out("alt")._5)
    val (es, ev, ez, et) = expected(xs.map(_.toLong))
    assert(s === es && var18 === ev && z === ez && t === et)
    assert(!t.get, "alternation is not a monotone trend")
  }

  test("q237 at sf0.001 == driver fold per type") {
    val rows = graft.sources.Tables(spark, sf0001, "events")
      .groupBy(col("event_type").as("g"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("g"), col("day"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byType = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toSeq
    }
    val got = MannKendall.q237.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (es, ev, ez, et) = expected(byType(r.getString(0)))
      assert(r.getLong(2) === es && r.getLong(3) === ev,
        s"${r.getString(0)} integer leaves")
      assert((if (r.isNullAt(4)) None else Some(r.getDouble(4))) === ez)
      assert((if (r.isNullAt(5)) None else Some(r.getBoolean(5))) === et)
    }
  }
}
