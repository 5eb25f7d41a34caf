package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[MarkovBacktest]] (X210) oracles: a planted timeline with a
  * known chain shows the split/fit/score arithmetic by hand
  * (including the straddling pair exclusion and the unseen-state
  * account), and q243 at sf0.001 ≡ a driver replay of the full
  * backtest.
  */
class MarkovBacktestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(ev: Seq[(Long, Int, String)])
      : Map[String, (Option[String], Long, Long, Long,
        Option[Double])] = {
    val dir = tmpDir("markovbt")
    ev.zipWithIndex.map { case ((u, day, ty), i) =>
      (i.toLong, new Timestamp((19723L + day) * 86400000L +
        i * 60000L), u, ty)
    }.toDF("event_id", "ts", "user_id", "event_type")
      .selectExpr("event_id", "ts", "user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    MarkovBacktest.q243.build(spark, dir).collect().map { r =>
      r.getString(0) -> ((Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    }.toMap
  }

  test("hand-planted chain: argmax fit on the head, scored on the " +
      "tail, straddling pair in neither, unseen state accounted") {
    // days 0..10, cutoff = 0 + 10*4 div 5 = 8.
    // user 1 (train): A->B, B->A, A->B  (A->B twice, B->A once)
    //   then day 7 A, day 9 B: straddling pair (7 < 8 <= 9) dropped.
    // user 2 (test): day 8 A, day 9 B, day 10 C:
    //   A->B (correct: pred A = B), B->C (wrong: pred B = A).
    // user 3 (test): day 8 Z, day 9 A: Z unseen in train.
    val out = run(Seq(
      (1L, 0, "A"), (1L, 1, "B"), (1L, 2, "A"), (1L, 3, "B"),
      (1L, 7, "A"), (1L, 9, "B"),
      (2L, 8, "A"), (2L, 9, "B"), (2L, 10, "C"),
      (3L, 8, "Z"), (3L, 9, "A")))
    assert(out("A") === ((Some("B"), 1L, 1L, 0L, Some(1.0))))
    assert(out("B") === ((Some("A"), 1L, 0L, 0L, Some(0.0))))
    assert(out("Z") === ((None, 1L, 0L, 1L, Some(0.0))))
    assert(out("__all__") === ((None, 3L, 1L, 1L, Some(1.0 / 3.0))))
  }

  test("q243 at sf0.001 == driver replay of the whole backtest") {
    val rows = graft.sources.Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        (unix_timestamp(date_trunc("day", col("ts"))) / 86400L)
          .cast("long").as("day"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getTimestamp(4)))
    val cut = rows.map(_._4).min +
      (rows.map(_._4).max - rows.map(_._4).min) * 4 / 5
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._5.getTime, e._2)).toList
      sorted.zip(sorted.drop(1)).map { case (a, b) =>
        (a._3, b._3,
          if (b._4 < cut) "train"
          else if (a._4 >= cut) "test" else "straddle")
      }
    }
    val pred = pairs.filter(_._3 == "train")
      .groupBy(p => (p._1, p._2)).toSeq
      .map { case ((c, n), xs) => (c, n, xs.size) }
      .groupBy(_._1).map { case (c, xs) =>
        c -> xs.minBy(x => (-x._3, x._2))._2
      }
    val test = pairs.filter(_._3 == "test")
    val expected = test.groupBy(_._1).toSeq.map { case (c, xs) =>
      val p = pred.get(c)
      val correct = p.map(pp => xs.count(_._2 == pp).toLong)
        .getOrElse(0L)
      c -> ((p, xs.size.toLong, correct,
        if (p.isEmpty) xs.size.toLong else 0L))
    }.toMap
    val got = MarkovBacktest.q243.build(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.filter(_.getString(0) != "__all__").foreach { r =>
      val (p, nt, nc, nu) = expected(r.getString(0))
      assert(Option(r.getString(1)) === p && r.getLong(2) === nt &&
        r.getLong(3) === nc && r.getLong(4) === nu,
        s"state ${r.getString(0)}")
      assert(r.getDouble(5) === nc.toDouble / nt.toDouble)
    }
    val all = got.find(_.getString(0) == "__all__").get
    assert(all.getLong(2) === expected.values.map(_._2).sum)
    assert(all.getLong(3) === expected.values.map(_._3).sum)
  }
}
