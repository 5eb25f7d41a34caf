package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[RankBiasedOverlap]] (X225) oracles: identical lists read RBO =
  * the truncated maximum, disjoint lists read 0, and top-churn moves
  * the score more than tail-churn at equal Jaccard (the property the
  * operator exists for).
  */
class RankBiasedOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Int, Long, Double)])
      : Seq[(Long, Double)] = {
    val dir = tmpDir("rbo")
    rows.zipWithIndex.map { case ((m, cust, rev), i) =>
      (i.toLong, cust, "O", rev,
        Timestamp.valueOf(f"2024-${m + 1}%02d-05 00:00:00"), "P1")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    RankBiasedOverlap.q257.build(spark, dir).collect().toSeq
      .map(r => (r.getLong(1), r.getDouble(2)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("identical full lists: per-member tail weights sum to the " +
      "X_d = d truncated maximum") {
    val rows = for (m <- 0 to 1; c <- 1L to 20L)
      yield (m, c, 1000.0 - c)
    val out = run(rows)
    assert(out.map(_._1) === Seq(20L))
    // member at rank m (both lists) contributes Tails(m-1), summed in
    // DECIMAL(30,14) — the driver replica of the engine tree
    val wsum = (1 to 20).map(m =>
      BigDecimal(RankBiasedOverlap.Tails(m - 1))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(out.head._2 ===
      round6((1.0 - RankBiasedOverlap.P) * wsum.toDouble))
  }

  test("disjoint lists: RBO = 0") {
    val rows = (1L to 5L).map(c => (0, c, 100.0)) ++
      (11L to 15L).map(c => (1, c, 100.0))
    assert(run(rows) === Seq((0L, 0.0d)))
  }

  test("top-churn hurts more than tail-churn at equal retention") {
    // m0 -> m1: the RANK-1 member is replaced by a newcomer (cust 21
    // takes the top; 2..20 keep their ranks) — 19 shared members.
    // m2 -> m3: the RANK-20 member is replaced (cust 22 enters at the
    // bottom; 1..19 keep their ranks) — also 19 shared members.
    val m0 = (1L to 20L).map(c => (0, c, 1000.0 - c))
    val m1 = (2L to 20L).map(c => (1, c, 1000.0 - c)) :+ (1, 21L, 1000.0)
    val m2 = (1L to 20L).map(c => (2, c, 1000.0 - c))
    val m3 = (1L to 19L).map(c => (3, c, 1000.0 - c)) :+ (3, 22L, 900.0)
    val out = run(m0 ++ m1 ++ m2 ++ m3)
    assert(out.size === 3)
    val topSwap = out(0)
    val tailSwap = out(2)
    assert(topSwap._1 === 19L && tailSwap._1 === 19L,
      "equal retention by construction")
    assert(topSwap._2 < tailSwap._2,
      "replacing the top member must cost more RBO than the tail")
  }
}
