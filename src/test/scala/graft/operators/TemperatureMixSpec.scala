package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TemperatureMix]] (X94) and [[ScoreCalibration]] (X95) semantic
  * oracles: √-temperature lifts the tail relative to proportional
  * sampling (the property it exists for) while probabilities stay
  * normalized; calibration preserves within-source order, equalizes
  * kept fractions across sources, and maps deciles onto the global
  * quantile vector.
  */
class TemperatureMixSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("sqrt-temperature: probabilities normalize, the low-resource " +
      "tail is lifted above its proportional share, the head damped") {
    val rows = TemperatureMix.q144.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pSum = rows.map(_.getAs[Double]("p_r")).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"p must normalize: $pSum")
    val totalToks = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val byShare = rows.map { r =>
      val prop = r.getAs[Long]("n_tokens") / totalToks
      (r.getAs[String]("lang"), prop, r.getAs[Double]("p_r"))
    }
    val head = byShare.maxBy(_._2); val tail = byShare.minBy(_._2)
    assert(tail._3 > tail._2,
      s"tail ${tail._1} must be lifted: p=${tail._3} vs prop=${tail._2}")
    assert(head._3 < head._2,
      s"head ${head._1} must be damped: p=${head._3} vs prop=${head._2}")
    // alloc consistency: floor(p * budget) within rounding of alloc
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("alloc") -
        r.getAs[Double]("p_r") * TemperatureMix.Budget) <
        TemperatureMix.Budget / 1000.0)
    }
  }

  test("calibration: within-source order preserved, a global cut at a " +
      "calibrated threshold keeps ~the same decile fraction per source") {
    val rows = ScoreCalibration.q145.build(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("quality"),
        r.getAs[Int]("src_decile"), r.getAs[Double]("calibrated_r")))
    assert(rows.nonEmpty)
    // deciles are monotone in quality within a source, and calibrated
    // scores are monotone in decile (global quantile vector is sorted)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byQ = rs.sortBy(r => (r._2, r._3))
      assert(byQ.map(_._3).sorted.toSeq === byQ.map(_._3).toSeq ||
        rs.map(_._3).distinct.length <= 10)
      val decCal = rs.groupBy(_._3).view.mapValues(_.map(_._4).head)
      val decs = decCal.keys.toSeq.sorted
      decs.sliding(2).foreach {
        case Seq(a, b) => assert(decCal(a) <= decCal(b),
          s"calibrated must be monotone in decile: $a->$b")
        case _ =>
      }
      // same-decile docs in DIFFERENT sources share the calibrated
      // value — the equalization property
    }
    val byDecile = rows.groupBy(r => (r._3))
      .view.mapValues(_.map(_._4).distinct).toMap
    byDecile.foreach { case (dec, vals) =>
      assert(vals.length === 1,
        s"decile $dec must map to ONE global value across sources: $vals")
    }
  }
}
