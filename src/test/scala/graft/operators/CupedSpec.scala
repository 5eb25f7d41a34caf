package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Cuped]] (X97) semantic oracles: when pre-period and experiment
  * metrics correlate strongly, the CUPED lift equals the TRUE planted
  * effect while the raw lift is contaminated by an unbalanced-user
  * artifact; θ and ρ² match a driver replay; with zero correlation
  * CUPED ≈ raw.
  */
class CupedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : String = {
    val d = tmpDir("cuped-events")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ts(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

  test("planted effect: strong x-y correlation -> CUPED recovers the " +
      "true lift where raw is contaminated by user-mix imbalance") {
    // 20 users with heterogeneous BASELINE activity b(u) = 10 + u;
    // pre-period x = b(u); experiment y = b(u) + effect(arm).
    // True effect: arm1 adds +5. The user mix is IMBALANCED on
    // baseline (odd users -- arm 1 -- have higher b on average), so
    // the raw lift over-estimates; CUPED removes the baseline term
    // exactly (rho^2 ~ 1) and recovers ~5.
    var eid = 0L
    val rows = (0 until 20).flatMap { u =>
      val b = 10.0 + u
      val effect = if (u % 2 == 1) 5.0 else 0.0
      eid += 2
      Seq(
        (eid - 1, ts(1), u.toLong, "view", b),           // pre period
        (eid, ts(23), u.toLong, "view", b + effect))     // experiment
    }
    val got = Cuped.q146.build(spark, dir(rows)).collect()(0)
    assert(got.getAs[Long]("n0") === 10L)
    assert(got.getAs[Long]("n1") === 10L)
    // raw lift = 5 (effect) + 1 (baseline imbalance: odd mean b is
    // +1 above even mean)
    assert(math.abs(got.getAs[Double]("lift_raw_r") - 6.0) < 1e-6)
    // CUPED: y = x + effect, so theta ≈ 1 — not exactly, because the
    // planted imbalance makes effect itself correlate with x (theta
    // absorbs cov(x, effect)/var(x) ≈ 0.038 here)
    assert(math.abs(got.getAs[Double]("theta_r") - 1.0) < 0.05)
    assert(math.abs(got.getAs[Double]("lift_cuped_r") - 5.0) < 0.05)
    assert(got.getAs[Double]("var_reduction_r") > 0.8) // effect variance keeps rho2 off 1
  }

  test("corpus moments match a driver replay (theta, rho2)") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val users = ev.groupBy(_._1).map { case (_, es) =>
      // BigDecimal mirrors the engine's exact decimal sums
      val x = es.filter(_._3 < mid).map(e => BigDecimal(e._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      val y = es.filter(_._3 >= mid).map(e => BigDecimal(e._2)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (x.toDouble, y.toDouble)
    }.toSeq
    val n = users.size.toDouble
    val sx = users.map(_._1).sum; val sy = users.map(_._2).sum
    val sxy = users.map(u => u._1 * u._2).sum
    val sxx = users.map(u => u._1 * u._1).sum
    val syy = users.map(u => u._2 * u._2).sum
    val covxy = (sxy - sx * sy / n) / n
    val varx = (sxx - sx * sx / n) / n
    val vary = (syy - sy * sy / n) / n
    val got = Cuped.q146.build(spark, sf0001).collect()(0)
    assert(math.abs(got.getAs[Double]("theta_r") - covxy / varx) < 1e-2)
    assert(math.abs(got.getAs[Double]("var_reduction_r") -
      covxy * covxy / (varx * vary)) < 1e-2)
  }
}
