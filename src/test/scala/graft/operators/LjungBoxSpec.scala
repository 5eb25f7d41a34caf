package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[LjungBox]] (X197) oracles: a strongly autocorrelated planted
  * series is rejected while a pinned pseudo-random one is not, the
  * per-lag r_k match a hand fold, and q233 at sf0.001 ≡ a driver
  * replay of the full statistic (bit-for-bit doubles — the fixed
  * double tree contract).
  */
class LjungBoxSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Write an events fixture with one row per (type, hour, count). */
  private def run(series: Seq[(String, Int, Int)]): Map[String,
      (Long, Seq[Option[Double]], Option[Double], Option[Boolean])] = {
    val dir = tmpDir("ljungbox")
    series.flatMap { case (ty, h, c) =>
      (0 until c).map { i =>
        (ty, Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d " +
          f"${h % 24}%02d:10:00"), (h * 1000 + i).toLong, 1L)
      }
    }.toDF("event_type", "ts", "event_id", "user_id")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    LjungBox.q233.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        (2 to 7).map(i => if (r.isNullAt(i)) None
          else Some(r.getDouble(i))),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)),
        if (r.isNullAt(9)) None else Some(r.getBoolean(9))))
    }.toMap
  }

  /** Driver fold of the exact statistic over an hourly count series,
    * mirroring the operator's double tree op for op.
    */
  private def expected(xs: Seq[Long])
      : (Seq[Double], Double, Boolean) = {
    val n = xs.length
    val s1 = xs.sum
    val s2 = xs.map(x => x * x).sum
    val mean = s1.toDouble / n.toDouble
    val den = s2.toDouble - n.toDouble * mean * mean
    val rs = (1 to LjungBox.MaxLag).map { k =>
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      val p = pairs.map { case (a, b) => a * b }.sum
      val hs = pairs.map(_._1).sum
      val ts = pairs.map(_._2).sum
      (p.toDouble - mean * (hs + ts).toDouble +
        (n - k).toDouble * mean * mean) / den
    }
    val q = n.toDouble * (n + 2).toDouble *
      rs.zipWithIndex.map { case (r, i) =>
        r * r / (n - (i + 1)).toDouble
      }.sum
    (rs, q, q > LjungBox.ChiSq95)
  }

  test("a linear ramp is serially dependent at every lag: Q blows " +
      "past the chi-square bar and the feed is rejected") {
    val ramp = (0 until 48).map(h => ("ramp", h, 1 + h / 2))
    val out = run(ramp)
    val (_, rs, q, rej) = (0, out("ramp")._2, out("ramp")._3,
      out("ramp")._4)
    assert(rs.head.get > 0.5, s"lag-1 ACF of a ramp must be high: $rs")
    assert(q.get > LjungBox.ChiSq95 && rej.get)
  }

  test("a pinned pseudo-random series is NOT rejected; r_k and Q " +
      "equal the driver fold bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val xs = (0 until 100).map(_ => 5 + rnd.nextInt(10))
    val out = run(xs.zipWithIndex.map { case (c, h) => ("wn", h, c) })
    val (n, rs, q, rej) = out("wn")
    assert(n === 100L)
    val (ers, eq, erej) = expected(xs.map(_.toLong))
    (rs.map(_.get) zip ers).foreach { case (got, exp) =>
      assert(got === exp, "r_k must equal the driver fold exactly")
    }
    assert(q.get === eq && rej.get === erej)
    assert(!rej.get, "the planted white noise must pass (reseed the " +
      "fixture if a future estimator change lands on the 5% tail)")
  }

  test("constant series: denominator exactly 0 -> NULL statistics " +
      "(guarded, not a divide error)") {
    val out = run((0 until 30).map(h => ("flat", h, 4)))
    val (_, rs, q, rej) = (0, out("flat")._2, out("flat")._3,
      out("flat")._4)
    assert(rs.forall(_.isEmpty) && q.isEmpty && rej.isEmpty)
  }

  test("series shorter than MinHours are excluded") {
    val out = run((0 until 10).map(h => ("short", h, h + 1)))
    assert(!out.contains("short"))
  }

  test("q233 at sf0.001 == driver replay per type") {
    val rows = graft.sources.Tables(spark, sf0001, "events")
      .groupBy(col("event_type").as("g"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("g"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byType = rows.groupBy(_._1).toSeq.map { case (g, xs) =>
      g -> xs.map(_._2).toSeq
    }.toMap
    val got = LjungBox.q233.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val xs = byType(r.getString(0))
      assert(xs.length >= LjungBox.MinHours)
      val (ers, eq, erej) = expected(xs)
      (2 to 7).zip(ers).foreach { case (i, e) =>
        assert(r.getDouble(i) === e,
          s"${r.getString(0)} r${i - 1} mismatch")
      }
      assert(r.getDouble(8) === eq && r.getBoolean(9) === erej)
    }
  }
}
