package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SpearmanCorrelation]] (X194) oracles: a nonlinear but monotone
  * plant scores exactly 1 (the Pearson/Spearman separation), the
  * anti-monotone plant −1, a hand-computed tie case via average
  * ranks, the constant-column NULL, and sf0.001 ≡ a driver replay of
  * ranks and sums.
  */
class SpearmanCorrelationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Double)])
      : Map[String, (Long, Option[Double])] = {
    val dir = tmpDir("spearman")
    rows.zipWithIndex.map { case ((g, x, y), i) =>
      (i.toLong, 1L, 1L, 1, x, y, 0.0, 0.0, g, "O",
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    SpearmanCorrelation.q230.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1),
        Option(r.getAs[Any]("spearman")).map(_.asInstanceOf[Double])))
    }.toMap
  }

  test("monotone-nonlinear is exactly 1, anti-monotone exactly -1, " +
      "constant column NULL") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val out = run(
      xs.map(x => ("M", x, x * x * x)) ++
        xs.map(x => ("A", x, -x * x * x)) ++
        xs.map(x => ("C", x, 7.0)))
    assert(out("M") === ((5L, Some(1.0))))
    assert(out("A") === ((5L, Some(-1.0))))
    assert(out("C") === ((5L, None)))
  }

  test("ties via average ranks: x = (1,1,2), y = (1,2,3) — " +
      "rho = sqrt(3)/2") {
    // rank2(x) = (3,3,6); rank2(y) = (2,4,6)
    // centered covariance num = n*sxy - sx*sy = 3*54 - 12*12 = 18
    // dx = 3*54 - 144 = 18; dy = 3*56 - 144 = 24
    // rho = 18/sqrt(18*24) = sqrt(3)/2
    val out = run(Seq(("T", 1.0, 1.0), ("T", 1.0, 2.0), ("T", 2.0, 3.0)))
    assert(out("T")._2 === Some(18.0 / math.sqrt(18.0 * 24.0)))
  }

  test("q230 at sf0.001 ≡ driver replay of average-tie ranks and the " +
      "double tree") {
    val rows = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = SpearmanCorrelation.q230.build(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("spearman")))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      def rank2(vs: Seq[Double]): Seq[Long] = {
        val sorted = vs.sorted
        val minRank = vs.map(v => sorted.indexWhere(_ == v) + 1L)
        val cnt = vs.map(v => vs.count(_ == v).toLong)
        minRank.zip(cnt).map { case (r, c) => 2 * r + c - 1 }
      }
      val rx = rank2(rs.map(_._2).toSeq)
      val ry = rank2(rs.map(_._3).toSeq)
      val n = BigInt(rs.length)
      val sx = rx.map(BigInt(_)).sum; val sy = ry.map(BigInt(_)).sum
      val sxx = rx.map(v => BigInt(v) * v).sum
      val syy = ry.map(v => BigInt(v) * v).sum
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val num = (n * sxy - sx * sy).toDouble
      val dx = (n * sxx - sx * sx).toDouble
      val dy = (n * syy - sy * sy).toDouble
      val (gn, rho) = got(g)
      assert(gn === rs.length.toLong, g)
      // driver combines EXACT BigInt cross terms; the engine combines
      // exact sums in doubles — agree to double precision
      assert(math.abs(rho - num / math.sqrt(dx * dy)) < 1e-12, g)
    }
  }
}
