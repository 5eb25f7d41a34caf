package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[ScdHistory]] (X106) structural oracles (q153's value correctness
  * is the DuckDB hash check): consecutive-duplicate collapse, exactly
  * one open interval per entity, half-open interval tiling
  * (valid_to = next valid_from, no gaps, no overlaps), and a planted
  * A,A,B,B,A log producing exactly the A→B→A history.
  */
class ScdHistorySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)]): Seq[(Long, String,
      Long, Option[Long])] = {
    val dir = tmpDir("scd")
    rows.zipWithIndex.map { case ((u, a, ts), i) =>
      (i.toLong, new java.sql.Timestamp(ts), u, a, 0.0d, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    ScdHistory.q153.build(spark, dir).collect().map { r =>
      (r.getLong(0), r.getString(2), r.getTimestamp(3).getTime,
        Option(r.getTimestamp(4)).map(_.getTime))
    }.toSeq
  }

  test("planted A,A,B,B,A log collapses to the A->B->A history with " +
      "half-open tiling and one open interval") {
    val log = Seq((7L, "A", 1000L), (7L, "A", 2000L), (7L, "B", 3000L),
      (7L, "B", 4000L), (7L, "A", 5000L))
    val hist = run(log)
    assert(hist.map(h => (h._2, h._3, h._4)) === Seq(
      ("A", 1000L, Some(3000L)),
      ("B", 3000L, Some(5000L)),
      ("A", 5000L, None)))
  }

  test("corpus-wide invariants on real events: exactly one open " +
      "interval per user, intervals tile with no gaps or overlaps, " +
      "interval count equals the driver-side change count") {
    val hist = ScdHistory.q153.build(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getString(2), r.getTimestamp(3).getTime,
        Option(r.getTimestamp(4)).map(_.getTime))
    }.toSeq
    val byUser = hist.groupBy(_._1)
    byUser.foreach { case (u, iv) =>
      assert(iv.count(_._4.isEmpty) === 1, s"user $u open intervals")
      val sorted = iv.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3),
            s"user $u: interval ending ${a._4} != next start ${b._3}")
        case _ =>
      }
    }
    // driver-side change count from the raw log
    val raw = graft.sources.Tables(spark, sf0001, "events")
      .selectExpr("user_id", "event_type", "unix_micros(ts) AS tsu",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val changes = raw.groupBy(_._1).map { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._4)).map(_._2).toSeq
      1 + ordered.sliding(2).count {
        case Seq(a, b) => a != b
        case _ => false
      }
    }.sum
    assert(hist.size === changes, "interval count != driver change count")
  }
}
