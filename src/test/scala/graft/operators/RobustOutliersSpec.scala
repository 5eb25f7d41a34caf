package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RobustOutliers]] (X88) semantic oracles: median/MAD on a planted
  * group match hand-computed values, the gate's 50 % breakdown point
  * holds (a burst of corrupt values barely moves the cut where
  * mean/stddev would chase it), and the corpus output matches a driver
  * replay.
  */
class RobustOutliersSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dir(rows: Seq[(Long, String, Double)]): String = {
    val d = tmpDir("robust-events")
    rows.map { case (id, t, v) =>
      (id, Timestamp.valueOf("2024-01-01 10:00:00"), id % 7, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("planted group: median, MAD, and the k*MAD cut match hand " +
      "computation") {
    // values 1..9 plus one wild 1000: median = 5.5, adevs of 1..9 are
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5} + 994.5 → MAD = 2.5
    // cut = 1.5*2.5 = 3.75 → outliers: |x-5.5|>3.75 → {1, 1000} = 2
    val rows = (1 to 9).map(i => (i.toLong, "click", i.toDouble)) :+
      (10L, "click", 1000.0)
    val got = RobustOutliers.q139.build(spark, dir(rows)).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[Double]("med_r") === 5.5)
    assert(r.getAs[Double]("mad_r") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 2L)
  }

  test("50% breakdown: replacing 30% of a group with garbage moves " +
      "the median cut by ~nothing (the reason MAD, not stddev)") {
    val clean = (1 to 70).map(i => (i.toLong, "view", (i % 10).toDouble))
    val poisoned = clean ++ (71 to 100).map(i =>
      (i.toLong, "view", 100000.0 + i))
    val gc = RobustOutliers.q139.build(spark, dir(clean)).collect()(0)
    val gp = RobustOutliers.q139.build(spark, dir(poisoned)).collect()(0)
    // the robustness property: the poisoned median stays INSIDE the
    // clean data's [0, 9] range (it shifts 4.5 → 7.0 — a quantile
    // position move, never a value chase), where the MEAN would land
    // at ~30,000 and a mean±k·stddev gate would flag NOTHING
    val cleanVals = clean.map(_._3)
    assert(gp.getAs[Double]("med_r") <= cleanVals.max &&
      gp.getAs[Double]("med_r") >= cleanVals.min,
      s"poisoned median ${gp.getAs[Double]("med_r")} left the clean range")
    val mean = poisoned.map(_._3).sum / poisoned.size
    assert(mean > 10 * cleanVals.max, "sanity: the mean DID chase")
    assert(gc.getAs[Long]("n_outliers") === 0L ||
      gc.getAs[Long]("n_outliers") < 20L)
    // every poison row lands outside the cut
    assert(gp.getAs[Long]("n_outliers") >= 30L)
  }

  test("corpus output matches a driver replay (interpolated median " +
      "and MAD per event_type)") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val got = RobustOutliers.q139.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val xs = ev.filter(_._1 == t).map(_._2)
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      assert(math.abs(r.getAs[Double]("med_r") - med) < 1e-3)
      assert(math.abs(r.getAs[Double]("mad_r") - mad) < 1e-3)
      val out = xs.count(x => math.abs(x - med) > RobustOutliers.K * mad)
      assert(r.getAs[Long]("n_outliers") === out.toLong)
    }
  }
}
