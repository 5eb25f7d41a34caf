package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[FdAudit]] (X169) on planted tables: an FD that holds exactly
  * (g3 = 0, zero violating groups), one broken in a known pattern
  * where g3 = n − Σ max must be hand-checkable, and the NULL-handling
  * contract (groupBy treats NULL as one RHS value, so an all-NULL RHS
  * group does not violate).
  */
class FdAuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)])
      : (Long, Long, Long, Long, Boolean) = {
    val r = FdAudit
      .audit(rows.toDF("lhs", "rhs"), "t", "lhs", "rhs")
      .collect().head
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_lhs"),
      r.getAs[Long]("n_violating_lhs"), r.getAs[Long]("g3_rows"),
      r.getAs[Boolean]("holds"))
  }

  test("holding FD: every LHS group single-valued — g3 0, holds") {
    val out = run(Seq("a" -> "x", "a" -> "x", "b" -> "y", "c" -> "x"))
    assert(out === ((4L, 3L, 0L, 0L, true)))
  }

  test("broken FD: g3 is the minimum-deletion count n - sum(max), " +
      "not the violating-row count") {
    // group a: x,x,x,y  -> keep 3, delete 1
    // group b: p,q      -> keep 1, delete 1 (tie on counts — max is 1)
    // group c: z        -> intact
    val out = run(Seq(
      "a" -> "x", "a" -> "x", "a" -> "x", "a" -> "y",
      "b" -> "p", "b" -> "q", "c" -> "z"))
    assert(out === ((7L, 3L, 2L, 2L, false)))
  }

  test("NULL RHS is one value: an all-NULL group holds; NULL plus a " +
      "real value violates") {
    val rows = Seq(("a", null), ("a", null), ("b", null), ("b", "y"))
      .toDF("lhs", "rhs")
    val r = FdAudit.audit(rows, "t", "lhs", "rhs").collect().head
    assert(r.getAs[Long]("n_violating_lhs") === 1L)
    assert(r.getAs[Long]("g3_rows") === 1L)
  }

  test("q208 at sf0.001: key-FD l_orderkey -> l_returnflag verdicts " +
      "match a driver replay per candidate") {
    val rows = FdAudit.q208.build(spark, sf0001).collect()
    assert(rows.length === FdAudit.Candidates.length)
    val byFd = rows.map(r => r.getAs[String]("fd") -> r).toMap
    FdAudit.Candidates.foreach { case (fd, table, lhs, rhs) =>
      val data = spark.read
        .parquet(s"$sf0001/$table.parquet")
        .select(lhs, rhs).collect()
        .map(r => (r.get(0), r.get(1)))
      val groups = data.groupBy(_._1)
      val g3 = data.length -
        groups.values.map(g => g.groupBy(_._2).values.map(_.size).max).sum
      val viol = groups.values.count(g => g.map(_._2).distinct.size > 1)
      val r = byFd(fd)
      assert(r.getAs[Long]("n_rows") === data.length.toLong, fd)
      assert(r.getAs[Long]("n_lhs") === groups.size.toLong, fd)
      assert(r.getAs[Long]("n_violating_lhs") === viol.toLong, fd)
      assert(r.getAs[Long]("g3_rows") === g3.toLong, fd)
    }
  }
}
