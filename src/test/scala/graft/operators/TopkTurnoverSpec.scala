package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** [[TopkTurnover]] (X223) oracles: full retention, a hand-built
  * partial overlap through the K = 20 cut, and the revenue-rank
  * tie-break determinism.
  */
class TopkTurnoverSpec extends SparkSpec {
  import spark.implicits._

  /** Plant one order per (monthIdx, custkey, revenue). */
  private def run(rows: Seq[(Int, Long, Double)])
      : Seq[(Long, Long, Long, Double)] = {
    val dir = tmpDir("tko")
    rows.zipWithIndex.map { case ((m, cust, rev), i) =>
      (i.toLong, cust, "O", rev,
        Timestamp.valueOf(f"2024-${m + 1}%02d-05 00:00:00"), "P1")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    TopkTurnover.q256.build(spark, dir).collect().toSeq.map { r =>
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
  }

  test("same leaderboard both months: jaccard 1") {
    val rows = for (m <- 0 to 1; c <- 1L to 5L)
      yield (m, c, 100.0 - c)
    assert(run(rows) === Seq((5L, 5L, 5L, 1.0d)))
  }

  test("the K cut decides membership: hand-built partial overlap") {
    // month 0: custs 1..25 with revenue descending in custkey ->
    // top-20 = {1..20}; month 1: revenue ascending -> top-20 = {6..25}
    val rows = (1L to 25L).map(c => (0, c, 1000.0 - c.toDouble)) ++
      (1L to 25L).map(c => (1, c, c.toDouble))
    val out = run(rows)
    // intersection {6..20} = 15; union 20+20-15 = 25
    assert(out === Seq((20L, 20L, 15L, 0.6d)))
  }

  test("revenue ties break on custkey, identically every month") {
    // 21 customers, all the same revenue: top-20 = custs 1..20 both
    val rows = for (m <- 0 to 1; c <- 1L to 21L) yield (m, c, 50.0)
    assert(run(rows) === Seq((20L, 20L, 20L, 1.0d)))
  }
}
