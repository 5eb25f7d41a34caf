package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[HaarEnergy]] (X198) oracles: hand-computed coefficients on a
  * planted series (incomplete tail blocks excluded per level), scale
  * separation on a period-4 square wave, partitioning invariance, and
  * q234 at sf0.001 ≡ a driver replay — all exact longs.
  */
class HaarEnergySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(series: Seq[(String, Int, Int)])
      : Map[(String, Int), (Long, Long, Long)] = {
    val dir = tmpDir("haar")
    series.flatMap { case (ty, h, c) =>
      (0 until c).map { i =>
        (ty, Timestamp.valueOf(f"2024-01-${1 + h / 24}%02d " +
          f"${h % 24}%02d:10:00"), (h * 1000 + i).toLong, 1L)
      }
    }.toDF("event_type", "ts", "event_id", "user_id")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    HaarEnergy.q234.build(spark, dir).collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
  }

  /** Driver fold: complete-block signed sums per level. */
  private def expected(xs: Seq[Long], wd: Int)
      : Option[(Long, Long, Long)] = {
    val blocks = xs.grouped(wd).filter(_.length == wd).toSeq
    if (blocks.isEmpty) None
    else {
      val ds = blocks.map { b =>
        b.take(wd / 2).sum - b.drop(wd / 2).sum
      }
      Some((blocks.length.toLong, ds.map(d => d * d).sum,
        ds.map(math.abs).max))
    }
  }

  test("hand-planted 7-hour series: level-1 and level-2 coefficients " +
      "are the hand values, level 3 has no complete block") {
    // x = 3,1,4,4,2,1,5 (no zero hours — a zero-count hour is simply
    // ABSENT from the observed series) -> L1 pairs (3,1)(4,4)(2,1):
    // d=2,0,1, E=5; L2 block (3,1,4,4): d=3+1-4-4=-4, E=16; L3: only
    // 7 hours, no complete block.
    val xs = Seq(3, 1, 4, 4, 2, 1, 5)
    val out = run(xs.zipWithIndex.map { case (c, h) => ("a", h, c) })
    assert(out(("a", 1)) === ((3L, 5L, 2L)))
    assert(out(("a", 2)) === ((1L, 16L, 4L)))
    assert(!out.contains(("a", 3)), "incomplete level-3 block excluded")
  }

  test("scale separation: a period-4 square wave has zero level-1 " +
      "energy inside its half-periods and all energy at level 2") {
    // x = 5,5,1,1 repeated: L1 pairs (5,5)(1,1) -> d=0; L2 d=8.
    val xs = (0 until 32).map(h => if (h % 4 < 2) 5 else 1)
    val out = run(xs.zipWithIndex.map { case (c, h) => ("sq", h, c) })
    assert(out(("sq", 1)) === ((16L, 0L, 0L)), "L1 blind to period 4")
    assert(out(("sq", 2))._2 === 8L * 8L * 8L,
      "8 level-2 blocks at d=8 each")
    assert(out(("sq", 3))._2 === 0L, "period 4 cancels inside width 8")
  }

  test("partitioning invariance: repartitioned input, same energies") {
    val dir = tmpDir("haar-part")
    val rnd = new scala.util.Random(3)
    (0 until 40).flatMap { h =>
      (0 until 1 + rnd.nextInt(5)).map { i =>
        (("t" + (h % 2)), Timestamp.valueOf(f"2024-01-01 " +
          f"${h % 24}%02d:${i}%02d:00"), (h * 100 + i).toLong, 1L)
      }
    }.toDF("event_type", "ts", "event_id", "user_id")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .repartition(13)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val a = HaarEnergy.q234.build(spark, dir).collect().toSeq
      .map(_.toSeq)
    val b = HaarEnergy.q234.build(spark, dir).collect().toSeq
      .map(_.toSeq)
    assert(a === b && a.nonEmpty)
  }

  test("q234 at sf0.001 == driver replay per (type, level)") {
    val rows = graft.sources.Tables(spark, sf0001, "events")
      .groupBy(col("event_type").as("g"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("g"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byType = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toSeq
    }
    val got = HaarEnergy.q234.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val wd = 1 << r.getInt(1)
      val exp = expected(byType(r.getString(0)), wd).get
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === exp,
        s"${r.getString(0)} level ${r.getInt(1)}")
    }
    // and completeness: every (type, level) with a complete block
    val gotKeys = got.map(r => (r.getString(0), r.getInt(1))).toSet
    byType.foreach { case (g, xs) =>
      Seq(1, 2, 3).foreach { l =>
        if (xs.length >= (1 << l))
          assert(gotKeys.contains((g, l)), s"missing ($g, $l)")
      }
    }
  }
}
