package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[AbcClassification]] (X178) oracles: hand-planted revenue masses
  * with exact class boundaries (a row landing EXACTLY on 80 % is
  * still A — the inclusive decimal compare), rank boundaries, and an
  * sf0.001 driver replay of the whole cut.
  */
class AbcClassificationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(revByPart: Seq[(Long, Double)])
      : Map[String, (Long, Int, Int, Double)] = {
    val dir = tmpDir("abc")
    revByPart.map { case (p, r) =>
      // one lineitem row per part: extendedprice = r, discount 0
      (p, r, 0.0)
    }.toDF("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    AbcClassification.q216.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    }.toMap
  }

  test("50/30/15/5: prefixes 0,50,80,95 — the row whose prefix hits " +
      "exactly 80 starts B, the exact-95 prefix starts C") {
    val out = run(Seq((1L, 50.0), (2L, 30.0), (3L, 15.0), (4L, 5.0)))
    assert(out("A") === ((2L, 1, 2, 80.0)))
    assert(out("B") === ((1L, 3, 3, 15.0)))
    assert(out("C") === ((1L, 4, 4, 5.0)))
  }

  test("a single dominant part carrying 97 % is A alone (the " +
      "crossing row belongs to the higher class); the rest skip " +
      "straight to C") {
    val out = run(Seq((1L, 97.0), (2L, 1.0), (3L, 1.0), (4L, 1.0)))
    assert(out("A") === ((1L, 1, 1, 97.0)))
    // prefixes at p2..p4 are 97, 98, 99 — all ≥ 95 → C; no B row
    assert(!out.contains("B"))
    assert(out("C") === ((3L, 2, 4, 3.0)))
  }

  test("q216 at sf0.001 ≡ driver replay of the decimal cut") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def d2(x: Double) = BigDecimal(x.toString)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rev = li.groupBy(_._1).map { case (p, rs) =>
      p -> rs.map(r => d2(r._2) * (BigDecimal(1) - d2(r._3))).sum
    }.toSeq.sortBy { case (p, r) => (-r, p) }
    val total = rev.map(_._2).sum
    var cum = BigDecimal(0)
    val classed = rev.zipWithIndex.map { case ((p, r), i) =>
      val prefix = cum
      cum += r
      val cls =
        if (prefix * 100 < total * 80) "A"
        else if (prefix * 100 < total * 95) "B"
        else "C"
      (cls, i + 1, r)
    }
    val expect = classed.groupBy(_._1).map { case (c, xs) =>
      c -> ((xs.size.toLong, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).sum.toDouble))
    }
    val got = AbcClassification.q216.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2),
        r.getInt(3), r.getDouble(4)))).toMap
    assert(got.keySet === expect.keySet)
    expect.foreach { case (c, (n, lo, hi, r)) =>
      val (gn, glo, ghi, gr) = got(c)
      assert(gn === n && glo === lo && ghi === hi, c)
      assert(math.abs(gr - r) < 1e-6, c)
    }
  }
}
