package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TrimmedMean]] (X208) oracles: a planted group with one whale
  * shows the trim/winsorize arithmetic by hand, the k = 0 degenerate
  * collapses all three means to the raw mean, and q241 at sf0.001 ≡
  * a driver replay of the full audit.
  */
class TrimmedMeanSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(orders: Seq[(String, Double)])
      : Map[String, (Long, Long, Double, Double, Double, Double)] = {
    val dir = tmpDir("trim")
    orders.zipWithIndex.map { case ((pri, price), i) =>
      (i.toLong, (i % 7).toLong, "O", price,
        Timestamp.valueOf("2024-01-15 00:00:00"), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    TrimmedMean.q241.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    }.toMap
  }

  test("whale group, n = 20, k = 1: trim drops min and max, " +
      "winsorize clamps them to the 2nd/19th order statistics") {
    // 18 × 100.00, one 10.00, one 10000.00
    val vals = Seq(10.0) ++ Seq.fill(18)(100.0) ++ Seq(10000.0)
    val out = run(vals.map(v => ("1-URGENT", v)))
    val (n, k, raw, trimmed, winsor, pull) = out("1-URGENT")
    assert(n === 20L && k === 1L)
    assert(raw === (10.0 + 18 * 100.0 + 10000.0) / 20.0)
    assert(trimmed === 100.0, "trim removes exactly the two extremes")
    // winsorized: whale and dwarf clamped to 100 -> all 20 at 100
    assert(winsor === 100.0)
    assert(pull === raw - 100.0, "the whale's pull on the headline")
  }

  test("k = 0 (n < 20): all three means equal the raw mean") {
    val out = run(Seq.tabulate(7)(i => ("2-HIGH", 10.0 * (i + 1))))
    val (n, k, raw, trimmed, winsor, _) = out("2-HIGH")
    assert(n === 7L && k === 0L)
    assert(trimmed === raw && winsor === raw)
  }

  test("q241 at sf0.001 == driver replay per priority") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
      .collect()
      .map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP), r.getLong(2)))
    val byPri = rows.groupBy(_._1)
    val got = TrimmedMean.q241.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val pri = r.getString(0)
      val vs = byPri(pri).sortBy(x => (x._2, x._3)).map(_._2).toList
      val n = vs.length
      val k = n / 20
      val kept = vs.slice(k, n - k)
      val raw = (vs.sum.toDouble) / n.toDouble
      val trimmed = kept.sum.toDouble / kept.length.toDouble
      val winsor = (kept.sum + BigDecimal(k) * (vs(k) + vs(n - k - 1)))
        .toDouble / n.toDouble
      assert(r.getLong(1) === n.toLong && r.getLong(2) === k.toLong)
      assert(r.getDouble(3) === raw && r.getDouble(4) === trimmed)
      assert(r.getDouble(5) === winsor)
      assert(r.getDouble(6) === raw - trimmed)
    }
  }
}
