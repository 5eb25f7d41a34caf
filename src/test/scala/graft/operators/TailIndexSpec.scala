package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[TailIndex]] (X212) oracles: a planted Pareto tail recovers its
  * known exponent, an all-tied tail is guarded, small groups are
  * excluded, and q245 at sf0.001 ≡ a driver fold (bit-for-bit — the
  * sorted-fold contract).
  */
class TailIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(orders: Seq[(String, Double)])
      : Map[String, (Long, Long, Double, Option[Double],
        Option[Boolean])] = {
    val dir = tmpDir("tail")
    orders.zipWithIndex.map { case ((pri, price), i) =>
      (i.toLong, (i % 9).toLong, "O", price,
        Timestamp.valueOf("2024-02-01 00:00:00"), pri)
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    TailIndex.q245.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
    }.toMap
  }

  test("planted Pareto(alpha=1.5) tail: the estimator lands near the " +
      "true exponent and flags infinite variance") {
    // x = xmin * (1 - u)^(-1/alpha) on a deterministic uniform grid
    val alpha = 1.5
    val xs = (0 until 400).map { i =>
      val u = (i + 0.5) / 400.0
      100.0 * math.pow(1.0 - u, -1.0 / alpha)
    }
    val out = run(xs.map(v => ("1-URGENT", v)))
    val (n, k, _, a, inf) = out("1-URGENT")
    assert(n === 400L && k === TailIndex.K.toLong)
    assert(math.abs(a.get - alpha) < 0.5,
      s"Hill should land near 1.5, got ${a.get}")
    assert(inf.get, "alpha < 2 must flag infinite variance")
  }

  test("thin-tailed (uniform) group: alpha comes out LARGE and is " +
      "not flagged") {
    val xs = (0 until 300).map(i => 100.0 + i)
    val out = run(xs.map(v => ("2-HIGH", v)))
    val (_, _, _, a, inf) = out("2-HIGH")
    assert(a.get > 2.0 && !inf.get,
      s"a uniform tail is not a power law: ${a.get}")
  }

  test("all-tied tail: log sum exactly 0 -> guarded NULLs; small " +
      "groups excluded") {
    val out = run(
      Seq.fill(250)(("3-MEDIUM", 42.0)) ++
        (0 until 100).map(i => ("4-NOT SPECIFIED", 1.0 + i)))
    val (_, _, _, a, inf) = out("3-MEDIUM")
    assert(a.isEmpty && inf.isEmpty)
    assert(!out.contains("4-NOT SPECIFIED"), "n < MinN must be absent")
  }

  test("q245 at sf0.001 == driver fold per priority") {
    val rows = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderpriority", "o_totalprice", "o_orderkey")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val byPri = rows.groupBy(_._1)
    val got = TailIndex.q245.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val pri = r.getString(0)
      val vs = byPri(pri).toSeq
      assert(vs.length >= TailIndex.MinN)
      val top = vs.sortBy(x => (-x._2, x._3)).take(TailIndex.K + 1)
        .map(_._2).sorted
      val xmin = top.head
      val logSum = top.drop(1)
        .foldLeft(0.0)((acc, x) => acc + math.log(x / xmin))
      assert(r.getLong(1) === vs.length.toLong)
      assert(r.getDouble(3) === xmin)
      if (logSum > 0.0) {
        assert(r.getDouble(4) === TailIndex.K.toDouble / logSum,
          s"$pri alpha")
        assert(r.getBoolean(5) ===
          (TailIndex.K.toDouble / logSum < 2.0))
      } else assert(r.isNullAt(4))
    }
  }
}
