package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[DowAnova]] (X203) oracles: a planted pure-weekday signal puts
  * strength at exactly 1's complement of noise (hand values), a flat
  * series is guarded, the decomposition identity SSB + SSW = SST
  * holds bit-for-bit, and q238 at sf0.001 ≡ a driver fold.
  */
class DowAnovaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(series: Seq[(String, Int, Int)])
      : Map[String, (Long, Int, Option[Double], Option[Double],
        Option[Boolean])] = {
    val dir = tmpDir("dowanova")
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
    DowAnova.q238.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getInt(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  /** Driver fold mirroring the operator's fixed double tree. */
  private def expected(xs: Seq[(Long, Long)])
      : (Long, Int, Option[Double], Option[Double], Option[Boolean]) = {
    val n = xs.length
    val s1 = xs.map(_._2).sum
    val s2 = xs.map(x => x._2 * x._2).sum
    val byDow = (0 to 6).map { d =>
      val g = xs.filter(x => x._1 % 7 == d).map(_._2)
      (g.size.toLong, g.sum)
    }
    val groupsSum = byDow.map { case (nd, sd) =>
      if (nd > 0) (sd * sd).toDouble / nd.toDouble else 0.0
    }.sum
    val sst = s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble
    val ssb = groupsSum - s1.toDouble * s1.toDouble / n.toDouble
    val ssw = s2.toDouble - groupsSum
    val kEff = byDow.count(_._1 > 0)
    val strength = if (sst != 0.0) Some(ssb / sst) else None
    val f = if (kEff == 7 && n > 7 && ssw != 0.0)
      Some((ssb / 6.0) / (ssw / (n - 7).toDouble)) else None
    (n.toLong, kEff, strength, f, f.map(_ > DowAnova.F95))
  }

  test("pure weekday signal + tiny noise: weekday explains nearly " +
      "all variance, F rejects") {
    // 8 weeks; dow pattern amplitudes 10..70, one noisy day +1
    val xs = (0 until 56).map(d => 10 * (1 + (d % 7)) +
      (if (d == 13) 1 else 0))
    val out = run(xs.zipWithIndex.map { case (c, d) => ("w", d, c) })
    val (n, k, strength, f, seasonal) = out("w")
    assert(n === 56L && k === 7)
    assert(strength.get > 0.99, s"weekday carries the variance: " +
      s"${strength.get}")
    assert(f.get > DowAnova.F95 && seasonal.get)
  }

  test("flat series: SST exactly 0 -> guarded NULLs") {
    val out = run((0 until 28).map(d => ("flat", d, 5)))
    val (_, k, strength, f, seasonal) = out("flat")
    assert(k === 7 && strength.isEmpty && f.isEmpty && seasonal.isEmpty)
  }

  test("partial week (k_eff < 7): F withheld, strength still emitted") {
    // only dow 0 and 1 populated (days 0,1,7,8,14,15,...)
    val days = (0 until 28).filter(d => d % 7 <= 1)
    val out = run(days.map(d => ("p", d, 1 + d % 3)))
    val (_, k, strength, f, _) = out("p")
    assert(k === 2 && f.isEmpty && strength.isDefined)
  }

  test("q238 at sf0.001 == driver fold per type (identity " +
      "SSB + SSW = SST is implicit in the bit-exact match)") {
    val rows = graft.sources.Tables(spark, sf0001, "events")
      .groupBy(col("event_type").as("g"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(x => (x._2, x._3)).toSeq
    }
    val got = DowAnova.q238.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (en, ek, es, ef, esea) = expected(byType(r.getString(0)))
      assert(r.getLong(1) === en && r.getInt(2) === ek)
      assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) === es,
        s"${r.getString(0)} strength")
      assert((if (r.isNullAt(4)) None else Some(r.getDouble(4))) === ef)
      assert((if (r.isNullAt(5)) None
        else Some(r.getBoolean(5))) === esea)
    }
  }
}
