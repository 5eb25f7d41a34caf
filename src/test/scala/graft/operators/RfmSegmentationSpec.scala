package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RfmSegmentation]] (X176) oracles: NTILE's integer bucket rule
  * (larger buckets first) replayed on the driver, scores keyed by the
  * documented total orders (metric desc, custkey), monetary summed as
  * exact decimal, and the sf0.001 census ≡ a full driver replay.
  */
class RfmSegmentationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  /** Driver NTILE over an already-ordered key sequence. */
  private def ntileOf(ordered: Seq[Long], k: Int): Map[Long, Int] = {
    val n = ordered.size
    val base = n / k
    val extra = n % k
    ordered.zipWithIndex.map { case (key, i) =>
      // bucket b (0-based) holds base+1 rows while b < extra
      val b =
        if (i < (base + 1) * extra) i / (base + 1)
        else extra + (i - (base + 1) * extra) / math.max(base, 1)
      key -> (b + 1)
    }.toMap
  }

  test("scores: 7 customers into quintiles — buckets of 2,2,1,1,1 in " +
      "each dimension, orders (metric desc, custkey)") {
    // customer c: last day = c, n_orders = 8-c, monetary = 100*c
    val orders = (1 to 7).flatMap { c =>
      (0 until (8 - c)).map { i =>
        (c.toLong, ts(c), 100.0 * c / (8 - c))
      }
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = RfmSegmentation.scores(orders).collect()
      .map(r => r.getAs[Long]("custkey") ->
        ((r.getAs[Int]("r_q"), r.getAs[Int]("f_q"), r.getAs[Int]("m_q"))))
      .toMap
    val rOrder = (1L to 7L).sortBy(c => (-c, c)) // latest day first
    val fOrder = (1L to 7L).sortBy(c => (-(8 - c), c))
    val mExact = (1 to 7).map { c =>
      c.toLong -> BigDecimal((100.0 * c / (8 - c)).toString)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * (8 - c)
    }.toMap
    val mOrder = (1L to 7L).sortBy(c => (-mExact(c), c))
    val (rQ, fQ, mQ) =
      (ntileOf(rOrder, 5), ntileOf(fOrder, 5), ntileOf(mOrder, 5))
    (1L to 7L).foreach { c =>
      assert(got(c) === ((rQ(c), fQ(c), mQ(c))), s"cust $c")
    }
  }

  test("q214 at sf0.001 ≡ driver replay (scores and census)") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val perCust = orders.groupBy(_._1).map { case (c, os) =>
      (c, os.map(_._2.getTime).max, os.size.toLong,
        os.map(o => BigDecimal(o._3.toString)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
    }.toSeq
    val rQ = ntileOf(perCust.sortBy(p => (-p._2, p._1)).map(_._1), 5)
    val fQ = ntileOf(perCust.sortBy(p => (-p._3, p._1)).map(_._1), 5)
    val mQ = ntileOf(perCust.sortBy(p => (-p._4, p._1)).map(_._1), 5)
    val census = perCust
      .groupBy(p => (rQ(p._1), fQ(p._1), mQ(p._1)))
      .map { case (seg, ps) =>
        seg -> ((ps.size.toLong, ps.map(_._3).sum,
          ps.map(_._4).sum.toDouble))
      }
    val got = RfmSegmentation.q214.build(spark, sf0001).collect()
    assert(got.length === census.size)
    got.foreach { r =>
      val seg = (r.getInt(0), r.getInt(1), r.getInt(2))
      val (nc, no, m) = census(seg)
      assert(r.getLong(3) === nc, s"n_customers $seg")
      assert(r.getLong(4) === no, s"n_orders $seg")
      assert(math.abs(r.getDouble(5) - m) < 1e-6, s"monetary $seg")
    }
  }
}
