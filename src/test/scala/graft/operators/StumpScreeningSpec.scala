package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[StumpScreening]] (X177) oracles: a perfectly separable planted
  * label yields a cut with child Gini exactly 0 ranked first, an
  * uninformative feature's best cut cannot beat it, the bin census /
  * prefix arithmetic replays on the driver at sf0.001, and the
  * max-value row lands in the last bin (the LEAST cap).
  */
class StumpScreeningSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def li(rows: Seq[(Double, Double, Double, Double, String)]) =
    rows.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag")

  test("perfectly separable: quantity < 8 ⇔ label R — some quantity " +
      "cut has gini exactly 0 and rk 1; the constant-noise features " +
      "never reach 0") {
    val rows = (1 to 64).map { i =>
      val q = if (i % 2 == 0) i % 8 + 0.0 else 8.0 + i % 8
      (q, (i % 4).toDouble, 0.05, 0.02,
        if (q < 8) "R" else "N")
    }
    val out = StumpScreening.screen(li(rows)).collect()
    val qRows = out.filter(_.getString(0) == "l_quantity")
    val best = qRows.find(_.getAs[Int]("rk") == 1).get
    assert(best.getAs[Double]("gini_children") === 0.0)
    assert(best.getAs[Long]("pos_left") === best.getAs[Long]("n_left"))
    assert(best.getAs[Long]("pos_right") === 0L)
    val pRows = out.filter(_.getString(0) == "l_extendedprice")
    assert(pRows.forall(_.getAs[Double]("gini_children") > 0.0),
      "price is label-independent, no clean split exists")
  }

  test("max value lands in the last bin (LEAST cap), degenerate " +
      "all-left cut rows are excluded") {
    val rows = (0 to 16).map(i =>
      (i.toDouble, 1.0, 1.0, 1.0, if (i < 5) "R" else "N"))
    val out = StumpScreening.screen(li(rows))
      .filter("feature = 'l_quantity'").collect()
    // bins 0..15: value 16 (max) capped into bin 15; the bin-15 row is
    // the all-left degenerate cut and must be absent
    assert(out.map(_.getAs[Long]("bin")).max === 14L)
    assert(out.forall(r => r.getAs[Long]("n_right") > 0L))
    // constant features (min == max) are guarded to bin 0 → a single
    // bin, excluded as the degenerate all-left cut
    val consts = StumpScreening.screen(li(rows))
      .filter("feature = 'l_discount'").collect()
    assert(consts.isEmpty, "constant feature has no valid cut")
  }

  test("q215 at sf0.001 ≡ driver replay of bins, prefixes and the " +
      "double-tree gini") {
    val data = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag").collect()
      .map(r => (Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)), r.getString(4) == "R"))
    val got = StumpScreening.q215.build(spark, sf0001).collect()
    StumpScreening.Features.zipWithIndex.foreach { case (f, fi) =>
      val vs = data.map(_._1(fi))
      val (mn, mx) = (vs.min, vs.max)
      val binned = data.map { case (cols, pos) =>
        val b = math.min(StumpScreening.Bins - 1L,
          math.floor((cols(fi) - mn) * StumpScreening.Bins / (mx - mn))
            .toLong)
        (b, pos)
      }
      val census = binned.groupBy(_._1).map { case (b, xs) =>
        b -> ((xs.length.toLong, xs.count(_._2).toLong))
      }
      val bins = census.keys.toSeq.sorted
      val nAll = census.values.map(_._1).sum
      val pAll = census.values.map(_._2).sum
      var (nl, pl) = (0L, 0L)
      val expect = bins.flatMap { b =>
        nl += census(b)._1; pl += census(b)._2
        val (nr, pr) = (nAll - nl, pAll - pl)
        if (nl > 0 && nr > 0) {
          val negL = nl - pl; val negR = nr - pr
          val g = ((nl.toDouble -
            (pl * pl + negL * negL).toDouble / nl.toDouble) +
            (nr.toDouble -
              (pr * pr + negR * negR).toDouble / nr.toDouble)) /
            nAll.toDouble
          Some((b, nl, pl, nr, pr, g))
        } else None
      }
      val gotF = got.filter(_.getString(0) == f)
        .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_left"),
          r.getAs[Long]("pos_left"), r.getAs[Long]("n_right"),
          r.getAs[Long]("pos_right"),
          r.getAs[Double]("gini_children"))).toSeq
      assert(gotF === expect, s"feature $f")
    }
  }
}
