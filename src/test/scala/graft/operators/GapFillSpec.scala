package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[GapFill]] (X128) oracles: interior gaps get exact LOCF and linear
  * interpolation; the `coalesce(…, pv, nv)` fallbacks — unreachable
  * from q170's per-series [min,max] grid, but live the moment an
  * external calendar supplies the grid — backfill leading gaps from
  * the next observation and carry trailing gaps from the last; and the
  * full q170 output at sf0.001 matches a driver-side replay of the
  * fill exactly (same IEEE double tree).
  */
class GapFillSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def gridded(rows: Seq[(Long, Long, Option[Double])]) =
    rows.map { case (u, d, o) => (u, d, o) }
      .toDF("user_id", "day_no", "obs")

  test("interior gaps: LOCF carries the previous value, interpolation " +
      "is exact on representable deltas") {
    val out = GapFill.fill(gridded(Seq(
      (1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, None),
      (1L, 3L, Some(16.0))))).orderBy("day_no").collect()
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ===
      Seq(false, true, true, false))
    assert(out.map(_.getAs[Double]("fill_locf")).toSeq ===
      Seq(10.0, 10.0, 10.0, 16.0))
    assert(out.map(_.getAs[Double]("fill_interp")).toSeq ===
      Seq(10.0, 12.0, 14.0, 16.0))
  }

  test("leading gaps backfill from the next observation, trailing " +
      "gaps carry the last (the pv/nv coalesce fallbacks)") {
    val out = GapFill.fill(gridded(Seq(
      (2L, 0L, None), (2L, 1L, None), (2L, 2L, Some(5.0)),
      (2L, 3L, None), (2L, 4L, None)))).orderBy("day_no").collect()
    assert(out.map(_.getAs[Double]("fill_locf")).toSeq ===
      Seq(5.0, 5.0, 5.0, 5.0, 5.0))
    assert(out.map(_.getAs[Double]("fill_interp")).toSeq ===
      Seq(5.0, 5.0, 5.0, 5.0, 5.0))
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ===
      Seq(true, true, false, true, true))
  }

  test("single-observation series: one row, no gap, fills = obs") {
    val out = GapFill.fill(gridded(Seq((3L, 7L, Some(2.5))))).collect()
    assert(out.length === 1)
    assert(!out(0).getAs[Boolean]("is_gap"))
    assert(out(0).getAs[Double]("fill_locf") === 2.5)
    assert(out(0).getAs[Double]("fill_interp") === 2.5)
  }

  test("a series with no observations at all fills to null, not a crash") {
    val out = GapFill.fill(gridded(Seq((4L, 0L, None), (4L, 1L, None))))
      .collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_gap"))
      assert(r.isNullAt(r.fieldIndex("fill_locf")))
      assert(r.isNullAt(r.fieldIndex("fill_interp")))
    }
  }

  test("q170 at sf0.001 == driver-side replay of the fill, exact " +
      "doubles") {
    val got = GapFill.q170.build(spark, sf0001).collect()
    // rebuild the observed frame identically, then fill driver-side
    val obs = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day_no"))
      .agg(Q.dsum(col("value")).as("obs"))
      .collect()
      .map(r => (r.getAs[Number]("user_id").longValue,
        r.getLong(1), r.getDouble(2)))
    val expected = obs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (u, xs) =>
        val byDay = xs.map(x => x._2 -> x._3).toMap
        val days = (xs.map(_._2).min to xs.map(_._2).max)
        days.map { d =>
          byDay.get(d) match {
            case Some(v) => (u, d, Some(v), false, v, v)
            case None =>
              val pd = byDay.keys.filter(_ < d).max
              val nd = byDay.keys.filter(_ > d).min
              val (pv, nv) = (byDay(pd), byDay(nd))
              val interp = pv + (nv - pv) *
                ((d - pd).toDouble / (nd - pd).toDouble)
              (u, d, None, true, pv, interp)
          }
        }
    }
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (u, d, o, gap, locf, interp)) =>
      assert(r.getAs[Number]("user_id").longValue === u)
      assert(r.getAs[Long]("day_no") === d)
      assert(r.getAs[Boolean]("is_gap") === gap)
      o.foreach(v => assert(r.getAs[Double]("obs") === v))
      assert(r.getAs[Double]("fill_locf") === locf)
      assert(r.getAs[Double]("fill_interp") === interp)
    }
  }
}
