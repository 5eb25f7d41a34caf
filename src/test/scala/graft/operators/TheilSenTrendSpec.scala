package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TheilSenTrend]] (X131) oracles: an exactly-linear series returns
  * its slope exactly; one corrupted observation does NOT move the
  * median slope (the 29 % breakdown point that is the operator's
  * reason to exist — an OLS fit on the same data is dragged); and the
  * full q173 at sf0.001 matches a driver-side replay (pairwise slopes
  * + interpolated median).
  */
class TheilSenTrendSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Run q173 over a planted (user_id, day, value) purchase table. */
  private def run(rows: Seq[(Long, Long, Double)]) = {
    val dir = tmpDir("theilsen")
    rows.map { case (u, day, v) =>
      (u, new java.sql.Timestamp(day * 86400000L), 1L, "purchase", v,
        "p")
    }.toDF("user_id", "ts", "event_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    TheilSenTrend.q173.build(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
  }

  private def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("exactly linear series: trend == the line's slope, exactly") {
    val out = run((0L to 4L).map(d => (1L, d, 3.0 + 2.0 * d)))
    val r = out(1L)
    assert(r.getAs[Long]("n_obs") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Double]("trend_slope") === 2.0)
  }

  test("one corrupted observation does not move the median slope " +
      "(the breakdown property OLS lacks)") {
    // days 0..6 on slope 1, except day 3 spiked to 1000
    val vals = (0L to 6L).map(d =>
      (2L, d, if (d == 3) 1000.0 else d.toDouble))
    val out = run(vals)
    val r = out(2L)
    // brute-force replay
    val obs = vals.map { case (_, d, v) => (d, v) }
    val slopes = for {
      i <- obs.indices; j <- (i + 1) until obs.length
    } yield (obs(j)._2 - obs(i)._2) / (obs(j)._1 - obs(i)._1).toDouble
    assert(math.abs(r.getAs[Double]("trend_slope") -
      medianOf(slopes)) < 1e-12)
    assert(r.getAs[Double]("trend_slope") === 1.0,
      "median of slopes must sit on the clean trend, not the spike")
  }

  test("q173 at sf0.001 == driver-side replay of pairwise slopes and " +
      "interpolated medians") {
    val got = TheilSenTrend.q173.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    val obs = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day_no"))
      .agg(Q.dsum(col("value")).as("v"))
      .collect()
      .map(r => (r.getAs[Number]("user_id").longValue,
        r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    got.foreach { r =>
      val u = r.getAs[Number]("user_id").longValue
      val series = obs(u).map(x => (x._2, x._3)).sortBy(_._1)
      assert(r.getAs[Long]("n_obs") === series.length.toLong)
      val slopes = for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield (series(j)._2 - series(i)._2) /
        (series(j)._1 - series(i)._1).toDouble
      assert(r.getAs[Long]("n_pairs") === slopes.length.toLong)
      assert(math.abs(r.getAs[Double]("trend_slope") -
        medianOf(slopes)) < 1e-12, s"user $u trend")
      assert(math.abs(r.getAs[Double]("med_value") -
        medianOf(series.map(_._2))) < 1e-12, s"user $u level")
    }
  }
}
