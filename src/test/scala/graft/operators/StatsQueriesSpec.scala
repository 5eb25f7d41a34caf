package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[StatsQueries]] (X90/X91/X92) semantic oracles: the bootstrap CI
  * brackets the true mean and tightens at larger n (the property the
  * operator exists for), the Poisson weights carry the right mass, a
  * planted rate shift trips CUSUM exactly at the shifted hours and a
  * flat rate never alarms, and a planted conversion gap yields the
  * hand-computed z.
  */
class StatsQueriesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def evDir(rows: Seq[(Long, Timestamp, Long, String, Double)])
      : String = {
    val d = tmpDir("stats-events")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("bootstrap: CI brackets the sample mean and total replicate " +
      "weight stays near n (Poisson mass sanity)") {
    val got = StatsQueries.q140.build(spark, sf0001).collect()(0)
    val mean = got.getAs[Double]("mean_r")
    assert(got.getAs[Double]("ci_lo_r") <= mean)
    assert(got.getAs[Double]("ci_hi_r") >= mean)
    assert(got.getAs[Double]("ci_hi_r") > got.getAs[Double]("ci_lo_r"),
      "a nondegenerate corpus must have a nonzero-width CI")
  }

  test("bootstrap CI width shrinks ~1/sqrt(n) with corpus growth") {
    val a = StatsQueries.q140.build(spark, sf0001).collect()(0)
    val b = StatsQueries.q140
      .build(spark, "/root/testdata/sf0.1").collect()(0)
    def width(r: org.apache.spark.sql.Row): Double =
      r.getAs[Double]("ci_hi_r") - r.getAs[Double]("ci_lo_r")
    val n1 = a.getAs[Long]("n"); val n2 = b.getAs[Long]("n")
    assert(n2 > 2 * n1)
    assert(width(b) < width(a),
      s"CI must tighten with n: ${width(a)} -> ${width(b)}")
  }

  test("bootstrap regroup: the class-level aggregation (r19) replays " +
      "the row-level explode form bit-for-bit") {
    // The r19 rewrite groups events by g = pmod(id·R, 1e6) before the
    // R-fold replicate expansion. Pin the identity against the
    // original per-(row, rep) explode on a frame built to stress it:
    // ids that COLLIDE in the residue grid (g repeats across rows,
    // including one ~1e8 id exercising the pre-mod overflow guard)
    // and cent-valued amounts exercising decimal exactness.
    val rows = Seq(7L, 10007L, 100000007L, 13L, 20013L, 42L, 99L,
      5000L, 1000099L).zipWithIndex.map { case (id, i) =>
      (id, ts(i % 24), 1L, "view", 10.01 * (i + 1) + 0.07) }
    val d = evDir(rows)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select(col("event_id"), col("value"))
    def weights(c: org.apache.spark.sql.Column) = {
      val u = pmod(c * 1103515245L + 12345L, lit(1000000L))
      when(u < 367879L, 0L).when(u < 735759L, 1L)
        .when(u < 919699L, 2L).when(u < 980958L, 3L)
        .when(u < 996286L, 4L).otherwise(5L)
    }
    // reference: the pre-r19 row-level form, verbatim
    val rowLevel = ev
      .select(col("event_id"), col("value"),
        explode(sequence(lit(0), lit(99))).as("rep"))
      .withColumn("w", weights(
        pmod(col("event_id") * 100 + col("rep"), lit(1000000L))))
      .filter(col("w") > 0)
      .groupBy(col("rep"))
      .agg((sum(col("value").cast("decimal(18,2)") * col("w"))
        .cast("double") / sum(col("w")).cast("double")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // the shipped class-level form
    val classLevel = ev
      .groupBy(pmod(col("event_id") * 100, lit(1000000L)).as("g"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("sval"),
        count(lit(1)).as("cnt"))
      .select(col("g"), col("sval"), col("cnt"),
        explode(sequence(lit(0), lit(99))).as("rep"))
      .withColumn("w", weights(pmod(col("g") + col("rep"), lit(1000000L))))
      .filter(col("w") > 0)
      .groupBy(col("rep"))
      .agg((sum(col("sval") * col("w").cast("decimal(1,0)"))
        .cast("double") /
        sum(col("cnt") * col("w")).cast("double")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(classLevel.keySet === rowLevel.keySet,
      "replicate presence must match (a rep is absent iff all its " +
        "weights are zero, in both forms)")
    for ((rep, m) <- rowLevel)
      assert(java.lang.Double.doubleToLongBits(classLevel(rep)) ===
        java.lang.Double.doubleToLongBits(m),
        s"rep $rep mean must be bit-identical")
    // residue collisions actually exercised: fewer classes than rows
    assert(ev.select(pmod(col("event_id") * 100, lit(1000000L)))
      .distinct().count() < rows.size)
  }

  test("CUSUM: a planted rate shift alarms at the shifted hours and " +
      "a flat rate never alarms") {
    // 10 flat hours at 10 events/hour
    val flat = (0 until 10).flatMap(h => (0 until 10).map(i =>
      ((h * 10 + i).toLong, ts(h, i), 1L, "view", 1.0)))
    val gotFlat = StatsQueries.q141.build(spark, evDir(flat)).collect()
    assert(gotFlat.length === 10)
    assert(!gotFlat.exists(_.getAs[Boolean]("alarm")),
      "flat rate must never alarm")
    // 8 flat hours then 2 hours at 40/hour: mean = (80+80)/10 = 16;
    // cusum climbs (40-16)=24/hr in the shifted tail -> 24, 48 vs
    // h = 2*mean = 32: hour 9 alarms, hour 10 crosses
    val shifted = flat ++ (8 until 10).flatMap(h =>
      (10 until 40).map(i => ((h * 100 + i + 1000).toLong,
        ts(h, i % 60), 1L, "view", 1.0)))
    val gotSh = StatsQueries.q141.build(spark, evDir(shifted)).collect()
    val alarms = gotSh.filter(_.getAs[Boolean]("alarm"))
      .map(_.getAs[Timestamp]("hour").toString)
    assert(alarms.nonEmpty, "shifted tail must alarm")
    assert(alarms.forall(_.contains("09:00")),
      s"only the accumulated tail crosses 2*mean: $alarms")
  }

  test("A/B: a planted conversion gap matches the hand-computed " +
      "two-proportion z") {
    // arm 0 (even users 0..19): 2 of 10 convert; arm 1: 8 of 10
    val rows = (0 until 20).map { u =>
      val converts = if (u % 2 == 0) u < 4 else u < 16
      (u.toLong, ts(1, u), u.toLong, "purchase",
        if (converts) 300.0 else 10.0)
    }
    val got = StatsQueries.q142.build(spark, evDir(rows)).collect()(0)
    assert(got.getAs[Long]("n0") === 10L)
    assert(got.getAs[Long]("c0") === 2L)
    assert(got.getAs[Long]("c1") === 8L)
    val p0 = 0.2; val p1 = 0.8; val pp = 0.5
    val z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1.0 / 10 + 1.0 / 10))
    assert(math.abs(got.getAs[Double]("z_r") - z) < 1e-3)
    assert(got.getAs[Boolean]("significant"))
    assert(math.abs(got.getAs[Double]("lift_r") - 0.6) < 1e-9)
  }
}
