package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[EquiDepthHistogram]] (X99) semantic oracles: buckets hold ~n/k
  * rows each on the corpus, ranges tile [min, max] monotonically, and
  * on a PLANTED skewed column the depth stays even while the bucket
  * WIDTHS expose the skew — the property equi-width bins cannot give.
  */
class EquiDepthHistogramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("corpus: ~n/k depth per bucket, monotone tiling ranges") {
    val rows = EquiDepthHistogram.q148.build(spark, sf0001).collect()
    assert(rows.length === EquiDepthHistogram.K)
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    val target = n.toDouble / EquiDepthHistogram.K
    rows.foreach { r =>
      val d = r.getAs[Long]("n_rows")
      assert(math.abs(d - target) <= math.max(2.0, 0.02 * target),
        s"bucket ${r.getAs[Int]("bucket")} depth $d vs target $target")
      assert(r.getAs[Double]("lo_r") <= r.getAs[Double]("hi_r"))
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi_r") <= b.getAs[Double]("lo_r") + 0.01,
          "bucket ranges must tile monotonically")
      case _ =>
    }
  }

  test("planted skew: even depth, widths expose the hot region") {
    // 90% of mass in [0, 1], 10% spread over [0, 1000]
    val vals = (1 to 900).map(i => (i.toLong, i / 900.0)) ++
      (1 to 100).map(i => (900L + i, i * 10.0))
    val d = tmpDir("histo")
    vals.toDF("l_orderkey", "l_extendedprice")
      .withColumn("l_quantity", lit(1.0))
      .withColumn("l_returnflag", lit("N"))
      .withColumn("l_shipdate", lit("2024-01-01"))
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = EquiDepthHistogram.q148.build(spark, d).collect()
    val widths = rows.map(r =>
      r.getAs[Double]("hi_r") - r.getAs[Double]("lo_r"))
    // the last bucket spans the sparse tail — orders of magnitude
    // wider than the first (which sits inside the hot [0,1] region)
    assert(widths.last > 100 * widths.head,
      s"skew must show in widths: head=${widths.head} last=${widths.last}")
    val depths = rows.map(_.getAs[Long]("n_rows"))
    assert(depths.max - depths.min <= 2,
      s"depth must stay even under skew: ${depths.toSeq}")
  }
}
