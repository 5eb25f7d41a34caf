package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[MoodMedian]] (X243) oracles: hand-computed k×2 χ² on a separated
  * fixture, the at-median exclusion convention, the doubled grand
  * median on even counts, and the no-split degenerate.
  */
class MoodMedianSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double)])
      : (Long, Long, Long, Option[Double], Double, Option[Boolean]) = {
    val dir = tmpDir("mood")
    rows.zipWithIndex.map { case ((grp, v), i) =>
      (i.toLong, i.toLong, "O", v,
        new Timestamp(86400000L * 19700L), grp)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = MoodMedian.q271.build(spark, dir).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      r.getDouble(4),
      if (r.isNullAt(5)) None else Some(r.getBoolean(5)))
  }

  test("complete separation: χ² = N, doubled median between groups") {
    // cents 100..300 vs 1000..1200; med2 = 300 + 1000 = 1300
    val rows = Seq("g1" -> 1.0, "g1" -> 2.0, "g1" -> 3.0,
      "g2" -> 10.0, "g2" -> 11.0, "g2" -> 12.0)
    val (nUsed, k, med2, chi2, crit, sig) = run(rows)
    assert(nUsed === 6L && k === 2L)
    assert(med2 === 1300L)
    // 2x2 with complete separation: chi2 = N = 6
    assert(chi2 === Some(6.0))
    assert(crit === 3.841459)
    assert(sig === Some(true))
  }

  test("at-median rows are excluded from the k×2 table") {
    // values 1,2,2,2,3 -> med2 = 400; the three 2.0s sit AT median
    val rows = Seq("g1" -> 1.0, "g1" -> 2.0, "g2" -> 2.0,
      "g2" -> 2.0, "g2" -> 3.0)
    val (nUsed, _, med2, _, _, _) = run(rows)
    assert(med2 === 400L)
    assert(nUsed === 2L) // only 1.0 and 3.0 survive
  }

  test("even count between two values: doubled median is their sum") {
    val rows = Seq("g1" -> 1.0, "g1" -> 2.0, "g2" -> 3.0, "g2" -> 4.0)
    val (_, _, med2, _, _, _) = run(rows)
    assert(med2 === 500L) // 200 + 300
  }

  test("identical groups: χ² = 0, not significant") {
    val rows = Seq("g1" -> 1.0, "g1" -> 9.0, "g2" -> 1.0, "g2" -> 9.0)
    val (nUsed, _, _, chi2, _, sig) = run(rows)
    assert(nUsed === 4L)
    assert(chi2 === Some(0.0))
    assert(sig === Some(false))
  }
}
