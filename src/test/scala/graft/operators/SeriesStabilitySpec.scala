package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[SeriesStability]] (X162) oracles: a planted constant series
  * (fano 0, acf1 NULL — the stated zero-variance contract), a planted
  * alternating series (strongly negative acf1) vs a planted
  * step-drift series (strongly positive acf1) that an aggregate
  * variance alone cannot separate, and sf0.001 ≡ a literal driver
  * replay of the exact-sums double tree.
  */
class SeriesStabilitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** One event per planted (type, hour, i<count). */
  private def run(series: Map[String, Seq[Int]])
      : Map[String, (Long, Long, Double, Double, Option[Double])] = {
    val rows = series.toSeq.flatMap { case (g, counts) =>
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map { i =>
          (g.hashCode.toLong * 100000 + h * 1000 + i,
            Timestamp.valueOf(f"2024-01-01 $h%02d:00:01"), g)
        }
      }
    }
    val dir = tmpDir("stability")
    rows.toDF("event_id", "ts", "event_type")
      .selectExpr("event_id", "ts", "event_id as user_id", "event_type",
        "1.0 as value", "'{}' as props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SeriesStability.q202.build(spark, dir).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Double]("mean"),
        r.getAs[Double]("fano"),
        Option(r.getAs[Any]("acf1")).map(_.asInstanceOf[Double])))
    }.toMap
  }

  test("constant series: fano 0, acf1 NULL; alternating series: " +
      "acf1 strongly negative; step drift: strongly positive — " +
      "same variance, opposite texture") {
    val out = run(Map(
      "const" -> Seq.fill(8)(5),
      "alt" -> Seq(2, 8, 2, 8, 2, 8, 2, 8),
      "step" -> Seq(2, 2, 2, 2, 8, 8, 8, 8)))
    val (nh, ne, mean, fano, acf) = out("const")
    assert(nh === 8L && ne === 40L && mean === 5.0)
    assert(fano === 0.0 && acf === None)
    val altAcf = out("alt")._5.get
    val stepAcf = out("step")._5.get
    assert(out("alt")._4 === out("step")._4,
      "same counts, same Fano — variance can't tell them apart")
    assert(altAcf < -0.5 && stepAcf > 0.5,
      s"acf1 separates them: alt $altAcf vs step $stepAcf")
  }

  test("q202 at sf0.001 == literal driver replay of the exact-sums tree") {
    val hourly = spark.read.parquet(s"$sf0001/events.parquet")
      .selectExpr("event_type", "date_trunc('hour', ts) as h").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, h), x) => (g, h, x) }
    val expected = hourly.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.sortBy(_._2.getTime).map(_._3)
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val p = xs.zip(xs.tail).map { case (a, b) => a * b }.sum
      val (xf, xl) = (xs.head, xs.last)
      val mean = s1.toDouble / n.toDouble
      val fano = (n * s2 - s1 * s1).toDouble / (n * s1).toDouble
      val den = s2.toDouble - n.toDouble * mean * mean
      val acf = if (den != 0.0)
        Some((p.toDouble - mean * (2 * s1 - xf - xl).toDouble +
          (n - 1).toDouble * mean * mean) / den)
      else None
      g -> ((n, s1, mean, fano, acf))
    }
    val got = SeriesStability.q202.build(spark, sf0001).collect().map { r =>
      r.getAs[String]("g") -> ((r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), r.getAs[Double]("mean"),
        r.getAs[Double]("fano"),
        Option(r.getAs[Any]("acf1")).map(_.asInstanceOf[Double])))
    }.toMap
    assert(got === expected.toMap)
  }
}
