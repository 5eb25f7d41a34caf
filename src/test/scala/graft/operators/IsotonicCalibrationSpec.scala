package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[IsotonicCalibration]] (X130) oracles: the closed minimax form the
  * operator computes (iso_i = max_{j<=i} min_{k>=i} avg over bins
  * j..k) must coincide with a literal driver-side PAVA run — block
  * merges compared as exact long cross-products, block averages as the
  * same single long/long double division — on planted violator
  * sequences and on the real q172 bins; and the fit is monotone
  * non-decreasing everywhere.
  */
class IsotonicCalibrationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Literal PAVA: pool adjacent violators, exact-rational compares. */
  private def pava(bins: Seq[(Long, Long, Long)]): Map[Long, Double] = {
    case class Block(n: Long, pos: Long, members: List[Long])
    var stack = List.empty[Block]
    bins.sortBy(_._1).foreach { case (b, n, pos) =>
      var cur = Block(n, pos, List(b))
      // violator: previous block's avg > current's (pos1/n1 > pos2/n2
      // ⇔ pos1*n2 > pos2*n1 — exact in longs at these sizes)
      while (stack.nonEmpty &&
          stack.head.pos * cur.n > cur.pos * stack.head.n) {
        val prev = stack.head
        stack = stack.tail
        cur = Block(prev.n + cur.n, prev.pos + cur.pos,
          prev.members ++ cur.members)
      }
      stack = cur :: stack
    }
    stack.flatMap(bl => bl.members.map(_ ->
      (bl.pos.toDouble / bl.n.toDouble))).toMap
  }

  private def fitOf(bins: Seq[(Long, Long, Long)]): Map[Long, Double] =
    IsotonicCalibration.fit(bins.toDF("bin", "n", "pos"))
      .collect()
      .map(r => r.getAs[Long]("bin") -> r.getAs[Double]("iso_rate"))
      .toMap

  private def assertClose(a: Map[Long, Double], b: Map[Long, Double]): Unit = {
    assert(a.keySet === b.keySet)
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) < 1e-12, s"bin $k: $v vs ${b(k)}")
    }
  }

  test("planted violator run pools to the PAVA solution: rates " +
      "[.1,.5,.3,.2,.9] -> [.1, 1/3, 1/3, 1/3, .9]") {
    val bins = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 3L),
      (3L, 10L, 2L), (4L, 10L, 9L))
    val got = fitOf(bins)
    assertClose(got, pava(bins))
    assert(got(0L) === 0.1)
    assert(math.abs(got(1L) - 1.0 / 3.0) < 1e-12)
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === 0.9)
  }

  test("already-monotone input is returned unchanged") {
    val bins = Seq((0L, 10L, 1L), (1L, 10L, 3L), (2L, 10L, 6L),
      (3L, 10L, 9L))
    val got = fitOf(bins)
    bins.foreach { case (b, n, pos) =>
      assert(got(b) === pos.toDouble / n.toDouble)
    }
  }

  test("unequal weights: a heavy violator drags the pool toward " +
      "itself (weighted, not simple, averaging)") {
    // rates [1/1 (n=1), 2/9 (n=9)] → pooled (1+2)/10 = 0.3
    val bins = Seq((0L, 1L, 1L), (1L, 9L, 2L))
    val got = fitOf(bins)
    assert(got(0L) === got(1L))
    assert(got(0L) === 3.0 / 10.0)
    assertClose(got, pava(bins))
  }

  test("q172 bins at sf0.001: minimax fit == driver PAVA, monotone " +
      "non-decreasing") {
    val rows = IsotonicCalibration.q172.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val triple = rows.map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
      r.getAs[Long]("pos"))).toSeq
    val expect = pava(triple)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("iso_rate") -
        expect(r.getAs[Long]("bin"))) < 1e-12)
    }
    val iso = rows.sortBy(_.getAs[Long]("bin"))
      .map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1), "fit must be monotone")
    }
  }
}
